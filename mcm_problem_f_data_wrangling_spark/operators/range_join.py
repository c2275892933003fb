"""Bounded range join (interval join) — the second time-join Spark
lacks a scalable native plan for (sibling of ``operators.asof``).

``r.ts BETWEEN l.ts AND l.ts + W`` as plain SQL is an inequality
join: Spark plans BroadcastNestedLoopJoin — O(|L|·|R|) and dead at
scale.  The standard fix (used by every production Spark range-join
implementation, cf. the bin-bucketing technique in open literature):
bucket time into ``bin`` cells of width >= W, explode the LEFT row
into the 2 bins its window can touch, equi-join on (key, bin), then
apply the exact range predicate.  Each qualifying pair meets in
exactly one bin (the right row's), so no dedup pass is needed.  The
join is a plain shuffle/broadcast equi-join — AQE, skew splitting,
and co-location all apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_sec(df: DataFrame, colname: str) -> F.Column:
    """Order key as DOUBLE seconds.  TIMESTAMP_NTZ cannot cast straight
    to a numeric type; route it through TIMESTAMP (exact under the
    session's pinned UTC zone).  Numeric columns pass through."""
    if "timestamp" in dict(df.dtypes)[colname]:
        return F.unix_micros(F.col(colname).cast("timestamp")) / F.lit(1e6)
    return F.col(colname).cast("double")


def windowed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    window_seconds: float,
) -> DataFrame:
    """Inner-join pairs where ``right_ts ∈ [left_ts, left_ts + W]`` and
    the ``on`` keys match.  Caller supplies distinct column names for
    the two timestamp columns.  Bin width = W ⇒ a left window spans at
    most 2 bins ⇒ the left side is exploded ≤ 2×, the right side not
    at all.
    """
    w = float(window_seconds)
    lsec = _epoch_sec(left, left_ts)
    rsec = _epoch_sec(right, right_ts)
    r = right.withColumn("__bin", F.floor(rsec / w).cast("long"))
    l = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(lsec / w).cast("long"),
                F.floor((lsec + w) / w).cast("long"),
            )
        ),
    )
    return (
        l.join(r, [*on, "__bin"])
        .filter((rsec >= lsec) & (rsec <= lsec + w))
        .drop("__bin")
    )
