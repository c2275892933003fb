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
