"""As-of (last-value-before) join — an operator Spark lacks natively
(engine extension; pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
equivalent).

Naive SQL for "latest right row with ``r.ts <= l.ts`` per key" is an
inequality join — Spark plans that as BroadcastNestedLoopJoin (or a
cartesian) and it dies at scale.  The scalable formulation used here:
tag and UNION both sides, sort each key's rows by (ts, side) inside a
single window, and carry the right side's columns forward with
``last(ignorenulls)`` — right rows sort before left rows at equal ts,
so the match is ``<=``.  ONE shuffle on the join key, no range
explosion, and AQE handles skewed keys like any other window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    attach: tuple[str, ...] = (),
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach ``attach`` columns
    from the latest right row with ``right_ts <= left_ts`` per ``on``
    key (NULLs when no such row).  ``tolerance_seconds`` additionally
    voids matches older than the given horizon (pandas
    ``merge_asof(tolerance=...)`` semantics).

    Ties on ``right_ts`` within a key resolve to one arbitrary row —
    the same contract as DuckDB ASOF JOIN / pandas merge_asof.
    """
    out_cols = [f"{c}{suffix}" for c in attach]
    ats = f"{right_ts}{suffix}"  # right timestamp always attached

    r = right.select(
        *on,
        F.col(right_ts).alias(ats),
        *[F.col(c).alias(f"{c}{suffix}") for c in attach],
        F.lit(0).alias("__side"),
    )
    l = left.withColumn(ats, F.lit(None).cast(r.schema[ats].dataType))
    for c, rc in zip(attach, out_cols):
        l = l.withColumn(rc, F.lit(None).cast(dict(right.dtypes)[c]))
    l = l.withColumn("__side", F.lit(1))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))

    order_ts = F.when(F.col("__side") == 0, F.col(ats)).otherwise(F.col(left_ts))
    w = (
        Window.partitionBy(*on)
        .orderBy(order_ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r.select(*l.columns))
    filled = unioned.withColumns(
        {c: F.last(c, ignorenulls=True).over(w) for c in [ats, *out_cols]}
    )
    out = filled.filter(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        # materialize the flag BEFORE voiding: the first voided column
        # is the right timestamp itself, which the predicate reads
        out = out.withColumn(
            "__stale",
            (F.col(left_ts).cast("double") - F.col(ats).cast("double"))
            > F.lit(float(tolerance_seconds)),
        )
        for c in [ats, *out_cols]:
            out = out.withColumn(
                c, F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("__stale")
    return out
