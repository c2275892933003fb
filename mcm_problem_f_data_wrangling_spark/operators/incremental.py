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


def histogram_state(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Mergeable fixed-bin histogram state: ``(keys..., bin_idx, n)``.

    The quantile complement to :func:`partial_aggregate` — count/sum/
    min/max merge trivially, but percentiles need a DISTRIBUTION
    state, and a fixed-edge equi-width histogram is the simplest one
    that merges exactly: same edges => merged counts are bin-wise
    sums, so (like the decimal sums) merged state is IDENTICAL to a
    full recompute, in any merge order or grouping.  The price is
    fixed resolution: estimates carry at most one bin-width of error
    and values outside [lo, hi) clamp into the edge bins (choose the
    domain once, when the state table is created).  NULLs contribute
    nothing.  State size is O(groups * n_bins), independent of
    history length.
    """
    if not (hi > lo) or n_bins < 1:
        raise ValueError(
            f"histogram_state requires hi > lo and n_bins >= 1, "
            f"got lo={lo}, hi={hi}, n_bins={n_bins}"
        )
    width = (hi - lo) / n_bins
    v = F.col(value_col)
    bin_idx = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    return (
        df.where(v.isNotNull())
        .groupBy(*keys, bin_idx.alias("bin_idx"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_histogram_states(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """History ∪ increment → new state: bin-wise count sums (exact,
    associative, commutative)."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin_idx")
        .agg(F.sum("n").alias("n"))
    )


def quantiles_from_histogram(
    state: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    n_bins: int,
    qs: list[float],
) -> DataFrame:
    """Per-group quantile estimates from histogram state: the UNIQUE
    bin whose cumulative span contains ``q * total`` (``cum_before <
    target <= cum`` — boundary-safe: a target landing exactly on a
    bin's cumulative total resolves to that bin, never the next), with
    linear interpolation inside it —
    ``est = lo + width * (bin + (q*total - cum_before) / n_bin)``.
    One window cumsum per group; output one row per group with a
    ``q<pct>`` column per requested quantile plus ``n_total``.
    Rounding is the cross-engine-portable ``floor(x*1e6 + 0.5)/1e6``
    (plans/base.py discipline), never ``round(double)``.
    """
    from pyspark.sql import Window

    if not (hi > lo) or n_bins < 1:
        raise ValueError(
            f"quantiles_from_histogram requires hi > lo and n_bins >= 1, "
            f"got lo={lo}, hi={hi}, n_bins={n_bins}"
        )
    width = (hi - lo) / n_bins
    w = Window.partitionBy(*keys).orderBy("bin_idx")
    c = state.select(
        *keys,
        "bin_idx",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(Window.partitionBy(*keys)).alias("total"),
    )
    aggs = [F.max("total").cast("long").alias("n_total")]
    for q in qs:
        target = F.lit(q) * F.col("total")
        before = F.col("cum") - F.col("n")
        est = F.lit(lo) + F.lit(width) * (
            F.col("bin_idx") + (target - before) / F.col("n")
        )
        hit = F.when((before < target) & (F.col("cum") >= target), est)
        aggs.append(
            (F.floor(F.max(hit) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                f"q{int(round(q * 100)):02d}"
            )
        )
    return c.groupBy(*keys).agg(*aggs)
