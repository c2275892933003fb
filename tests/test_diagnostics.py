"""Known-process property tests for the X4 diagnostics layer.

The numpy statistics (operators/diagnostics.py) stand in for
statsmodels/scipy (absent from this container), so correctness is
asserted against processes with known answers rather than library
output: white noise is stationary (ADF rejects, KPSS doesn't), a pure
random walk is not (ADF doesn't, KPSS does), an AR(1)'s lead
autocorrelation is its coefficient, a 12-period sinusoid's dominant
periodogram peak is 12, and already-normal data needs no Yeo-Johnson
bending (λ ≈ 1).  Parity target: EDA.ipynb cells 25-26.
"""

from __future__ import annotations

import numpy as np
import pytest

from mcm_problem_f_data_wrangling_spark.operators.diagnostics import (
    acf,
    adf_stat,
    kpss_stat,
    pacf,
    periodogram_period,
    run_diagnostics,
    yeo_johnson,
    yeo_johnson_mle,
)

N = 400


def _rng(seed: int = 1) -> np.random.Generator:
    """Per-test generator: draws must not depend on test ordering."""
    return np.random.default_rng(seed)


def test_white_noise_is_stationary():
    rng = _rng()
    y = rng.normal(0.0, 1.0, N)
    assert adf_stat(y) < -2.86  # reject unit root
    assert kpss_stat(y) < 0.463  # fail to reject stationarity


def test_random_walk_is_nonstationary():
    rng = _rng()
    y = np.cumsum(rng.normal(0.0, 1.0, N))
    assert adf_stat(y) > -2.86  # cannot reject unit root
    assert kpss_stat(y) > 0.463  # reject stationarity


def test_ar1_acf_pacf():
    rng = _rng(2)
    phi = 0.8
    y = np.empty(N)
    y[0] = 0.0
    eps = rng.normal(0.0, 1.0, N)
    for t in range(1, N):
        y[t] = phi * y[t - 1] + eps[t]
    r = acf(y, 5)
    p = pacf(y, 5)
    assert r[0] == 1.0 and p[0] == 1.0
    assert abs(r[1] - phi) < 0.1
    assert abs(p[1] - r[1]) < 1e-9  # PACF(1) ≡ ACF(1)
    assert abs(p[2]) < 0.15  # AR(1) ⇒ partial autocorrelation cuts off


def test_periodogram_finds_annual_cycle():
    rng = _rng()
    t = np.arange(N, dtype=float)
    y = 10.0 * np.sin(2 * np.pi * t / 12.0) + rng.normal(0.0, 0.5, N) + 0.05 * t
    assert periodogram_period(y) == 12


def test_yeo_johnson_identity_and_log_branches():
    y = np.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(yeo_johnson(y, 1.0), y, atol=1e-12)  # λ=1 ⇒ identity
    np.testing.assert_allclose(
        yeo_johnson(np.array([0.0, 1.0, np.e - 1.0]), 0.0), [0.0, np.log(2.0), 1.0]
    )
    # λ=2 negative branch is -log1p(-y)
    np.testing.assert_allclose(yeo_johnson(np.array([-1.0]), 2.0), [-np.log(2.0)])


def test_yeo_johnson_mle_normal_data_lambda_near_one():
    rng = _rng()
    y = rng.normal(50.0, 5.0, N)
    assert abs(yeo_johnson_mle(y) - 1.0) <= 0.5


def test_yeo_johnson_mle_lognormal_wants_log():
    rng = _rng()
    y = np.exp(rng.normal(0.0, 1.0, N))
    assert yeo_johnson_mle(y) < 0.5  # strong contraction toward log


@pytest.mark.usefixtures("spark")
def test_run_diagnostics_spark_end_to_end(spark):
    rng = _rng()
    import datetime

    rows = []
    t = np.arange(120, dtype=float)
    stationary = rng.normal(100.0, 3.0, 120)
    walk = 100.0 + np.cumsum(rng.normal(0.0, 3.0, 120))
    seasonal = 100.0 + 20.0 * np.sin(2 * np.pi * t / 12.0) + rng.normal(0.0, 1.0, 120)
    for name, series in [("flat", stationary), ("walk", walk), ("seasonal", seasonal)]:
        for i, v in enumerate(series):
            # NB: plain datetime.date — a pd.Timestamp in a plain tuple
            # infers as struct<> under Spark 4.1 createDataFrame.
            rows.append((name, datetime.date(2000 + i // 12, i % 12 + 1, 1), float(v)))
    df = spark.createDataFrame(rows, ["career", "month", "value"])
    out = {
        r["group"]: r
        for r in run_diagnostics(df, "career", "month", "value").collect()
    }
    assert set(out) == {"flat", "walk", "seasonal"}
    assert all(r["n_obs"] == 120 for r in out.values())
    assert out["flat"]["adf_reject_unit_root_5pct"] is True
    assert out["walk"]["adf_reject_unit_root_5pct"] is False
    assert out["walk"]["kpss_reject_stationary_5pct"] is True
    assert out["seasonal"]["seasonal_period"] == 12
    assert out["walk"]["acf1"] > 0.9  # random walk ⇒ near-unit lead autocorrelation


def test_adf_pvalue_mackinnon_anchors():
    """The MacKinnon (1994) response surface must reproduce the
    canonical critical-value ↔ p-value anchors for the constant case."""
    from mcm_problem_f_data_wrangling_spark.operators.diagnostics import adf_pvalue

    assert adf_pvalue(-2.86) == pytest.approx(0.05, abs=0.002)
    assert adf_pvalue(-3.43) == pytest.approx(0.01, abs=0.002)
    assert adf_pvalue(-2.57) == pytest.approx(0.10, abs=0.005)
    assert adf_pvalue(0.0) > 0.9
    assert adf_pvalue(-20.0) == 0.0 and adf_pvalue(5.0) == 1.0
    assert np.isnan(adf_pvalue(float("nan")))


def test_kpss_pvalue_table_interpolation():
    from mcm_problem_f_data_wrangling_spark.operators.diagnostics import kpss_pvalue

    assert kpss_pvalue(0.463) == pytest.approx(0.05)
    assert kpss_pvalue(0.739) == pytest.approx(0.01)
    assert kpss_pvalue(0.2) == pytest.approx(0.10)   # clamped low side
    assert kpss_pvalue(2.0) == pytest.approx(0.01)   # clamped high side
    mid = kpss_pvalue((0.347 + 0.463) / 2)
    assert 0.05 < mid < 0.10


def test_pvalues_agree_with_reject_flags(spark):
    """End-to-end: the 5% decision derived from the p-value must equal
    the critical-value flag for both tests on stationary and
    random-walk series."""
    rng = np.random.RandomState(4)
    rows = []
    rows += [("flat", t, float(v)) for t, v in enumerate(rng.normal(0, 1, 120))]
    rows += [("walk", t, float(v)) for t, v in enumerate(np.cumsum(rng.normal(0, 1, 120)))]
    df = spark.createDataFrame(rows, ["g", "t", "v"])
    out = {r["group"]: r for r in run_diagnostics(df, "g", "t", "v").collect()}
    for g in ("flat", "walk"):
        r = out[g]
        assert (r["adf_pvalue"] < 0.05) == r["adf_reject_unit_root_5pct"]
        assert (r["kpss_pvalue"] <= 0.05) == r["kpss_reject_stationary_5pct"]
    assert out["flat"]["adf_pvalue"] < 0.05 < out["walk"]["adf_pvalue"]
