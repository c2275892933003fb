"""Sketch-based approximate aggregates — the 100 TB substitutes for
exact distinct counts and exact percentiles (engine extension).

At scale, ``COUNT(DISTINCT x)`` shuffles every distinct value and
exact ``percentile`` buffers whole groups; the sketch versions carry
fixed-size state (HyperLogLog++ registers / a quantile summary) through
an ordinary partial/final aggregation, so cost is O(groups), not
O(rows).  The exact queries stay available (``a06_quantile_summary``,
``p11_distinct_pairs``) — these are the drop-ins once groups stop
fitting in memory.

Accuracy is implementation-defined (HLL++ rsd, Greenwald-Khanna
accuracy parameter), so there is no cross-engine oracle; correctness
is bounded-relative-error tests against the exact answers
(``tests/test_sketch.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.01,
) -> DataFrame:
    """Per-group HyperLogLog++ distinct count (relative std dev ``rsd``)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct"),
        F.count(value_col).alias("n_rows"),
    )


def rolling_distinct_exact(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Exact rolling N-day distinct actives (the WAU/MAU curve).

    Rolling COUNT(DISTINCT) cannot be composed from daily distinct
    counts (overlap) and DISTINCT isn't allowed in window aggregates;
    the distributed-exact formulation instead explodes each distinct
    (user, day) pair to the ``window_days`` report days it contributes
    to, then counts distinct users per report day — one explode (×N)
    over the already-deduped pair table + one shuffle.  Report days
    are restricted to days observed in the data (broadcast semi-join
    on the day spine).  Output: (day, active_users).
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    pairs = events.select(F.col(user_col), day).dropDuplicates()
    spine = pairs.select("day").dropDuplicates()
    contrib = pairs.select(
        F.col(user_col),
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
        "day",
    ).select(F.col(user_col), F.date_add("day", F.col("off")).alias("day"))
    return (
        contrib.join(F.broadcast(spine), "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct(user_col).alias("active_users"))
    )


def rolling_distinct_hll(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    lg_k: int = 12,
) -> DataFrame:
    """HLL-sketch rolling distinct actives — the 100 TB path.

    The exact version shuffles (user, day) pairs ×window_days; here
    the heavy aggregation builds ONE fixed-size Datasketches HLL
    sketch per day (partial/final, O(days) state), and the rolling
    union runs as a window aggregate over the tiny per-day sketch
    table (range frame over day numbers, so calendar gaps don't
    corrupt the window).  Output: (day, active_users_approx).
    Accuracy is sketch-defined — bounded-error tested, no SQL oracle.
    """
    from pyspark.sql import Window

    daily = (
        events.groupBy(F.date_trunc("day", F.col(ts_col)).cast("date").alias("day"))
        .agg(F.hll_sketch_agg(F.col(user_col), F.lit(lg_k)).alias("sk"))
        .withColumn("daynum", F.datediff("day", F.lit("1970-01-01").cast("date")))
    )
    w = (
        Window.orderBy("daynum")
        .rangeBetween(-(window_days - 1), Window.currentRow)
    )
    return daily.select(
        "day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "active_users_approx"
        ),
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna style summary,
    higher ``accuracy`` = tighter error = more state)."""
    q = F.percentile_approx(
        value_col, F.array(*[F.lit(x) for x in quantiles]), F.lit(accuracy)
    )
    out = df.groupBy(*group_cols).agg(q.alias("qs"))
    return out.select(
        *group_cols,
        *[
            F.round(F.col("qs")[i], 6).alias(f"p{int(x * 100):02d}")
            for i, x in enumerate(quantiles)
        ],
    )
