"""Incremental aggregate maintenance: merge new data into a persisted
partial-aggregate state without rescanning history.

The 100 TB pattern behind every "daily rollup" table: history is
petabytes, today's increment is gigabytes — recomputing the aggregate
from scratch scans everything, while a MERGEABLE state table
(count / decimal sum / min / max per group) updates with one scan of
the increment plus a re-aggregation of state rows.  Decimal sums make
the merge EXACT: merged state is bit-identical to a full recompute
(asserted by the oracle), which float sums cannot promise (their value
depends on aggregation order).

No analogue in the reference (it recomputes pandas groupbys from full
frames each run); engine extension per SURVEY.md §2.4 notes.

Shape: ``partial_aggregate`` is one map-side-combinable groupBy on the
input; ``merge_states`` is the SAME groupBy over unioned state rows —
state tables are tiny (O(groups)), so the merge cost is independent of
history size.  ``finalize`` is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_SCALE = 6  # decimal scale for exact, associative sums


def partial_aggregate(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Reduce raw rows to mergeable per-group state: for each measure
    ``m``: ``n_m`` (non-null count), ``sum_m`` (exact decimal),
    ``min_m`` / ``max_m``."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(F.col(m)).alias(f"n_{m}"),
            F.sum(F.col(m).cast(f"decimal(28,{STATE_SCALE})")).alias(f"sum_{m}"),
            F.min(F.col(m)).alias(f"min_{m}"),
            F.max(F.col(m)).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    a: DataFrame, b: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Combine two state tables (history ∪ increment → new history).
    Exact and associative: merging day-by-day, all-at-once, or in any
    grouping yields identical state."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"n_{m}").alias(f"n_{m}"),
            F.sum(f"sum_{m}")
            .cast(f"decimal(28,{STATE_SCALE})")
            .alias(f"sum_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def finalize(state: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Project the user-facing aggregate view from state: count, sum
    (double), mean (one IEEE division), min, max per measure."""
    cols = [F.col(k) for k in keys]
    for m in measures:
        n = F.col(f"n_{m}")
        s = F.col(f"sum_{m}").cast("double")
        cols += [
            n.cast("long").alias(f"n_{m}"),
            s.alias(f"sum_{m}"),
            (s / F.nullif(n, F.lit(0)).cast("double")).alias(f"avg_{m}"),
            F.col(f"min_{m}"),
            F.col(f"max_{m}"),
        ]
    return state.select(*cols)
