"""Model/simulation layer (X3-X5): deterministic drift fit + Monte-Carlo
distributional properties (SURVEY.md §4 item 3: seeded randn ≠ numpy
bit-for-bit, so MC is asserted on properties, not hashes)."""

from __future__ import annotations

import numpy as np
import pytest

from mcm_problem_f_data_wrangling_spark.operators.forecast import (
    fit_rw_drift_forecast,
    monte_carlo_forecast,
    quantile_fan_summary,
    simulate_paths,
)


@pytest.fixture(scope="module")
def trend(spark):
    rows = []
    for g, (start, slope) in {"a": (100.0, 2.0), "b": (50.0, -1.0)}.items():
        for t in range(30):
            rows.append((g, t, start + slope * t))
    return spark.createDataFrame(rows, ["career", "t", "y"])


def test_drift_fit_recovers_linear_slope(trend):
    out = fit_rw_drift_forecast(trend, "career", "t", "y", steps=3, tail_window=24)
    rows = {(r["group"], r["step"]): r for r in out.collect()}
    # exact linear trend: mu == slope, sigma == 0, forecast extrapolates
    assert rows[("a", 1)]["mu"] == pytest.approx(2.0)
    assert rows[("a", 1)]["sigma"] == pytest.approx(0.0)
    assert rows[("a", 3)]["forecast"] == pytest.approx(100.0 + 2.0 * 29 + 3 * 2.0)
    assert rows[("b", 2)]["forecast"] == pytest.approx(50.0 - 29.0 - 2.0)


def test_simulated_paths_distribution(spark):
    params = spark.createDataFrame(
        [("g", 1.0, 2.0, 100.0)], ["group", "mu", "sigma", "last_value"]
    )
    paths = simulate_paths(params, sims=400, steps=10, seed=3, clip_min=None).toPandas()
    assert len(paths) == 4000
    step10 = paths[paths["step"] == 10]["y"]
    # E[y_10] = 100 + 10*mu = 110, sd = sigma*sqrt(10) ≈ 6.32
    assert step10.mean() == pytest.approx(110.0, abs=1.5)
    assert step10.std() == pytest.approx(2.0 * np.sqrt(10), rel=0.2)


def test_clip_floor_applies(spark):
    params = spark.createDataFrame(
        [("g", -50.0, 1.0, 10.0)], ["group", "mu", "sigma", "last_value"]
    )
    paths = simulate_paths(params, sims=20, steps=5, seed=1, clip_min=0.0).toPandas()
    assert (paths["y"] >= 0.0).all()


def test_quantile_fan_monotone(trend):
    out = monte_carlo_forecast(trend, "career", "t", "y", sims=200, steps=6, seed=5)
    pdf = out.toPandas()
    assert len(pdf) == 12  # 2 groups × 6 steps
    for _, r in pdf.iterrows():
        assert r["p05"] <= r["p10"] <= r["p50"] <= r["p90"] <= r["p95"]
        assert r["min_y"] <= r["p05"] and r["p95"] <= r["max_y"]


def test_fan_summary_exact_quantiles(spark):
    rows = [("g", s, i, float(i)) for s in (1, 2) for i in range(1, 101)]
    paths = spark.createDataFrame(rows, ["group", "sim", "step", "y"])
    # here "sim" column is irrelevant to grouping: quantiles per step
    out = quantile_fan_summary(paths.selectExpr("group", "step as sim", "sim as step", "y"))
    r = out.filter("step = 1").head()
    assert r["p50"] == pytest.approx(np.quantile(np.arange(1.0, 101.0), 0.5))
    assert r["p95"] == pytest.approx(np.quantile(np.arange(1.0, 101.0), 0.95))


def test_equation_block_formats_fit(spark):
    from mcm_problem_f_data_wrangling_spark.operators.forecast import (
        drift_equation_block,
        fit_rw_drift_forecast,
    )

    rows = [("a", i, 100.0 + 2.0 * i) for i in range(30)]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    fit = fit_rw_drift_forecast(df, "g", "t", "v", steps=1)
    blocks = drift_equation_block(fit)
    assert set(blocks) == {"a"}
    assert "random walk with drift" in blocks["a"]
    assert "mu = 2.0000" in blocks["a"]  # exact linear trend → mu = slope
