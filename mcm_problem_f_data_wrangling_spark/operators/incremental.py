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


def quantile_sketch_state(
    df: DataFrame, keys: list[str], value_col: str, k: int = 128
) -> DataFrame:
    """Mergeable DOMAIN-FREE rank sketch: ``(keys..., anchors
    array<double>, n long)`` — ``k`` equal-weight rank anchors, anchor
    ``i`` (0-based) being the group's exact ``(i+0.5)/k`` percentile,
    each representing ``n/k`` of the group's weight.

    The quantile complement :func:`histogram_state` cannot provide
    when the value domain is unknown up front: a histogram needs
    ``[lo, hi)`` chosen at state creation, while rank anchors adapt
    to whatever the data is.  The price is merge-generation error
    instead of bin-width error: every compression back to ``k``
    anchors (state creation, each merge) moves an estimate by at most
    half an anchor slab, so after ``m`` state-touching operations any
    rank estimate is within ``m/(2k)`` of exact — the bound the gate
    asserts.  Exactness inside one state: anchors are Spark's EXACT
    interpolated ``percentile`` (sort-based, deterministic — not
    ``approx_percentile``), entirely JVM-side, no UDF.  NULLs
    contribute nothing; empty groups produce no state row.
    """
    if k < 2:
        raise ValueError(f"quantile_sketch_state requires k >= 2, got {k}")
    v = F.col(value_col).cast("double")
    pcts = F.array(*[F.lit((i + 0.5) / k) for i in range(k)])
    return (
        df.where(v.isNotNull())
        .groupBy(*keys)
        .agg(
            F.percentile(v, pcts).alias("anchors"),
            F.count(v).cast("long").alias("n"),
        )
    )


def merge_quantile_sketch_states(
    a: DataFrame, b: DataFrame, keys: list[str], k: int = 128
) -> DataFrame:
    """History ∪ increment → new sketch state: explode both anchor
    sets, weight every anchor by its source state's total count
    (anchors within a state are equal-weight, so ``frequency = n``
    gives the exact relative weighting), and recompress to ``k``
    anchors with one weighted exact-percentile aggregation.  Groups
    present on only one side pass through (recompressed).  Adds at
    most ``1/(2k)`` rank error per merge — see
    :func:`quantile_sketch_state` for the accumulated bound.
    """
    if k < 2:
        raise ValueError(f"merge_quantile_sketch_states requires k >= 2, got {k}")

    # the weighting below assumes BOTH states carry exactly k anchors
    # (each anchor represents n/k of its group's weight); merging a
    # state built with a different k would silently corrupt both the
    # count and the weighting — fail fast per state row instead
    # (assert_true returns NULL on success, so the filter keeps rows)
    def _guarded(s: DataFrame) -> DataFrame:
        return s.where(
            F.assert_true(
                F.size("anchors") == k,
                F.concat(
                    F.lit("merge_quantile_sketch_states: state carries "),
                    F.size("anchors").cast("string"),
                    F.lit(f" anchors, expected k={k}"),
                ),
            ).isNull()
        )

    exploded = (
        _guarded(a).select(*keys, F.explode("anchors").alias("v"), F.col("n"))
        .unionByName(
            _guarded(b).select(
                *keys, F.explode("anchors").alias("v"), F.col("n")
            )
        )
    )
    pcts = F.array(*[F.lit((i + 0.5) / k) for i in range(k)])
    return exploded.groupBy(*keys).agg(
        F.percentile(F.col("v"), pcts, F.col("n")).alias("anchors"),
        (F.sum("n") / F.lit(k)).cast("long").alias("n"),
    )


def quantiles_from_sketch(
    state: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Per-group quantile estimates from sketch state: the anchor
    whose rank slab contains ``q`` (0-based index ``floor(q*k)``,
    clamped — within ``1/(2k)`` of the target rank by construction),
    one row per group with a ``q<pct>`` column per requested quantile
    plus ``n_total``.  Pure array indexing, no exchange.
    """
    bad = [q for q in qs if not 0.0 <= float(q) <= 1.0]
    if bad:
        raise ValueError(
            f"quantiles_from_sketch requires 0 <= q <= 1, got {bad}"
        )
    cols = [F.col(c) for c in keys] + [F.col("n").alias("n_total")]
    size = F.size("anchors")
    for q in qs:
        idx = F.least(
            size, F.greatest(F.lit(1), (F.lit(float(q)) * size).cast("int") + 1)
        )
        cols.append(
            F.element_at("anchors", idx).alias(f"q{int(round(q * 100)):02d}")
        )
    return state.select(*cols)


def distinct_sketch_state(
    df: DataFrame, keys: list[str], value_col: str, k: int = 256
) -> DataFrame:
    """Mergeable DISTINCT-COUNT sketch: ``(keys..., kmv array<bigint>,
    n_state int)`` — the ``k`` smallest distinct 60-bit portable
    hashes per group (KMV / bottom-k, Bar-Yossef et al. 2002).

    The third member of the mergeable-state family: count/sum
    (:func:`partial_aggregate`) and rank (:func:`quantile_sketch_state`)
    states cannot answer "how many DISTINCT users did this group ever
    see" without rescanning history.  KMV can, and its merge is EXACT
    — the k smallest of a union is a pure function of the union, so
    merged state is IDENTICAL to a single-pass recompute in any merge
    order or grouping (like the decimal sums, unlike the quantile
    sketch's generation-bounded error).  The hash is the md5-derived
    ``portable_hash64`` (no RNG, no seed drift), so a SQL oracle
    reproduces the state — and therefore the estimate — bit-for-bit.
    State is O(groups * k); creation pays one distinct-shuffle of
    (keys, hash), which is the same order as the exact distinct it
    replaces — the sketch's value is every LATER increment merging in
    O(groups * k) instead of a history rescan.  NULLs contribute
    nothing.
    """
    from pyspark.sql import Window

    from ..functions.textfn import portable_hash64

    if k < 2:
        raise ValueError(f"distinct_sketch_state requires k >= 2, got {k}")
    d = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *keys,
            portable_hash64(F.col(value_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).cast("int").alias("n_state"),
        )
    )


def merge_distinct_sketch_states(
    a: DataFrame, b: DataFrame, keys: list[str], k: int = 256
) -> DataFrame:
    """History ∪ increment → new state: union the hash sets, keep the
    k smallest distinct per group.  Exact, associative, commutative —
    merged state equals the single-pass state over the union."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(
            f"merge_distinct_sketch_states requires k >= 2, got {k}"
        )
    ex = (
        a.select(*keys, F.explode("kmv").alias("h"))
        .unionByName(b.select(*keys, F.explode("kmv").alias("h")))
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).cast("int").alias("n_state"),
        )
    )


def distinct_from_sketch(
    state: DataFrame, keys: list[str], k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimate from KMV state: exact
    ``n_state`` while the group holds fewer than ``k`` distinct
    hashes, else the KMV estimator ``(k-1) * 2^60 / (h_k + 1)``
    (relative standard error ~ 1/sqrt(k-2)).  Every term is either an
    exact integer or one IEEE double op, so the estimate — not just a
    bound — is reproducible in the SQL oracle; rounding is the
    portable ``floor(x*1e6+0.5)/1e6``."""
    if k < 2:
        raise ValueError(f"distinct_from_sketch requires k >= 2, got {k}")
    hk = F.element_at("kmv", k)
    est = F.when(
        F.col("n_state") < k, F.col("n_state").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * 2**60)) / (hk.cast("double") + F.lit(1.0))
    )
    return state.select(
        *keys,
        F.col("n_state"),
        (F.floor(est * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "est_distinct"
        ),
    )
