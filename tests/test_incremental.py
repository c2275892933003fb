"""Incremental aggregate maintenance: merge == recompute, associativity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.incremental import (
    finalize,
    merge_states,
    partial_aggregate,
)

SF = "/root/testdata/sf0.001"
KEYS = ["l_returnflag"]
MEAS = ["l_quantity", "l_extendedprice"]


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()], key=lambda t: tuple(str(x) for x in t)
    )


def test_merge_equals_full_recompute_bitwise(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = li.filter(F.col("l_orderkey") % 3 == 0)
    b = li.filter(F.col("l_orderkey") % 3 != 0)
    merged = merge_states(
        partial_aggregate(a, KEYS, MEAS), partial_aggregate(b, KEYS, MEAS), KEYS, MEAS
    )
    full = partial_aggregate(li, KEYS, MEAS)
    # cast merged sums back to the state scale for comparison
    assert _rows(finalize(merged, KEYS, MEAS)) == _rows(finalize(full, KEYS, MEAS))


def test_merge_is_associative(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    parts = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    states = [partial_aggregate(p, KEYS, MEAS) for p in parts]
    left = merge_states(merge_states(states[0], states[1], KEYS, MEAS), states[2], KEYS, MEAS)
    right = merge_states(states[0], merge_states(states[1], states[2], KEYS, MEAS), KEYS, MEAS)
    assert _rows(finalize(left, KEYS, MEAS)) == _rows(finalize(right, KEYS, MEAS))


def test_empty_increment_is_identity(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    state = partial_aggregate(li, KEYS, MEAS)
    empty = partial_aggregate(li.filter(F.lit(False)), KEYS, MEAS)
    merged = merge_states(state, empty, KEYS, MEAS)
    assert _rows(finalize(merged, KEYS, MEAS)) == _rows(finalize(state, KEYS, MEAS))


def test_histogram_state_merge_equals_full_recompute(spark):
    """Merging day-shard histogram states in ANY grouping is
    bit-identical to the full-recompute state (fixed edges => bin-wise
    integer count sums)."""
    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        histogram_state,
        merge_histogram_states,
    )

    rows = [(i % 3, f"g{i % 2}", float((i * 37) % 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "day int, g string, v double")
    full = histogram_state(df, ["g"], "v", 0.0, 100.0, 10)
    shards = [
        histogram_state(df.where(F.col("day") == d), ["g"], "v", 0.0, 100.0, 10)
        for d in range(3)
    ]
    merged = merge_histogram_states(
        merge_histogram_states(shards[2], shards[0], ["g"]), shards[1], ["g"]
    )
    key = lambda r: (r["g"], r["bin_idx"])
    assert {key(r): r["n"] for r in merged.collect()} == {
        key(r): r["n"] for r in full.collect()
    }


def test_histogram_quantiles_interpolate_and_clamp(spark):
    """Uniform values 0..99 over [0,100) x 10 bins: p50 lands mid-
    domain within one bin width; NULLs contribute nothing; values
    outside the domain clamp into the edge bins instead of vanishing."""
    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        histogram_state,
        quantiles_from_histogram,
    )

    rows = [("a", float(i)) for i in range(100)] + [
        ("a", None),
        ("b", -50.0),   # clamps to bin 0
        ("b", 500.0),   # clamps to bin 9
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    st = histogram_state(df, ["g"], "v", 0.0, 100.0, 10)
    out = {
        r["g"]: r
        for r in quantiles_from_histogram(
            st, ["g"], 0.0, 100.0, 10, [0.5]
        ).collect()
    }
    assert out["a"]["n_total"] == 100  # NULL dropped
    assert abs(out["a"]["q50"] - 50.0) <= 10.0  # within one bin width
    assert out["b"]["n_total"] == 2  # clamped rows both counted
    assert 0.0 <= out["b"]["q50"] <= 100.0


def test_histogram_degenerate_params_raise(spark):
    """hi <= lo or n_bins < 1 must fail fast with ValueError (r9
    advisor: silent wrong bin indices / divide-by-zero width
    otherwise), matching the guards on sibling operators."""
    import pytest

    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        histogram_state,
        quantiles_from_histogram,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    st = histogram_state(df, ["g"], "v", 0.0, 100.0, 10)
    for lo, hi, nb in [(0.0, 0.0, 10), (5.0, 1.0, 10), (0.0, 100.0, 0)]:
        with pytest.raises(ValueError):
            histogram_state(df, ["g"], "v", lo, hi, nb)
        with pytest.raises(ValueError):
            quantiles_from_histogram(st, ["g"], lo, hi, nb, [0.5])


def test_quantile_sketch_bounds_and_merge_order_invariance(spark):
    """Rank-error bound: after s shard compressions and m merges every
    estimate is within (s+m+1)/(2k) of the exact rank, WHATEVER the
    merge order (error bound is worst-case, not average); a fresh
    single state on a small group is near-exact."""
    import pytest

    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        merge_quantile_sketch_states,
        quantile_sketch_state,
        quantiles_from_sketch,
    )

    k = 64
    # two groups, deliberately skewed: uniform 0..999 and quadratic
    rows = [("u", float(i), i % 3) for i in range(1000)] + [
        ("q", float(i * i), i % 3) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "g string, v double, day int")
    shards = [
        quantile_sketch_state(df.where(F.col("day") == d), ["g"], "v", k)
        for d in range(3)
    ]
    orders = [
        merge_quantile_sketch_states(
            merge_quantile_sketch_states(shards[0], shards[1], ["g"], k),
            shards[2], ["g"], k,
        ),
        merge_quantile_sketch_states(
            merge_quantile_sketch_states(shards[2], shards[0], ["g"], k),
            shards[1], ["g"], k,
        ),
    ]
    exact = {
        (r["g"],): sorted(
            x[1] for x in rows if x[0] == r["g"]
        )
        for r in df.select("g").distinct().collect()
    }
    eps = (3 + 2 + 1) / (2 * k)  # 3 shard compressions + 2 merges + slab
    for st in orders:
        est = {
            r["g"]: r
            for r in quantiles_from_sketch(st, ["g"], [0.1, 0.5, 0.9]).collect()
        }
        for g, vals in [("u", exact[("u",)]), ("q", exact[("q",)])]:
            n = len(vals)
            assert est[g]["n_total"] == n
            for q, col in [(0.1, "q10"), (0.5, "q50"), (0.9, "q90")]:
                rank = sum(1 for v in vals if v <= est[g][col])
                assert abs(rank - q * n) <= eps * n + 1, (g, q, rank)
    # single-state small group: anchors are exact percentiles
    small = spark.createDataFrame(
        [("s", float(i)) for i in range(10)], "g string, v double"
    )
    st = quantile_sketch_state(small, ["g"], "v", k)
    r = quantiles_from_sketch(st, ["g"], [0.5]).first()
    assert abs(r["q50"] - 4.5) <= 0.5
    with pytest.raises(ValueError):
        quantile_sketch_state(small, ["g"], "v", 1)
    with pytest.raises(ValueError):
        merge_quantile_sketch_states(st, st, ["g"], 0)


def test_distinct_sketch_merge_is_exact_and_small_groups_exact(spark):
    """KMV merge exactness: state from shards merged in ANY order is
    bit-identical to the single-pass state (k smallest of a union is
    a function of the union); groups under k distinct report exactly."""
    import pytest

    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        distinct_from_sketch,
        distinct_sketch_state,
        merge_distinct_sketch_states,
    )

    k = 16
    rows = [("big", f"u{i % 400}", i % 3) for i in range(1200)] + [
        ("small", f"v{i % 7}", i % 3) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, u string, day int")
    full = {
        r["g"]: (r["kmv"], r["n_state"])
        for r in distinct_sketch_state(df, ["g"], "u", k).collect()
    }
    shards = [
        distinct_sketch_state(df.where(F.col("day") == d), ["g"], "u", k)
        for d in range(3)
    ]
    for order in [(0, 1, 2), (2, 0, 1)]:
        m = merge_distinct_sketch_states(
            merge_distinct_sketch_states(shards[order[0]], shards[order[1]], ["g"], k),
            shards[order[2]], ["g"], k,
        )
        got = {r["g"]: (r["kmv"], r["n_state"]) for r in m.collect()}
        assert got == full, f"merge order {order} broke KMV exactness"
    est = {
        r["g"]: r for r in distinct_from_sketch(
            merge_distinct_sketch_states(
                merge_distinct_sketch_states(shards[0], shards[1], ["g"], k),
                shards[2], ["g"], k,
            ), ["g"], k,
        ).collect()
    }
    assert est["small"]["n_state"] == 7 and est["small"]["est_distinct"] == 7.0
    assert abs(est["big"]["est_distinct"] - 400) <= 0.8 * 400  # 3 sigma @ k=16
    with pytest.raises(ValueError):
        distinct_sketch_state(df, ["g"], "u", 1)
    with pytest.raises(ValueError):
        distinct_from_sketch(shards[0], ["g"], 0)


def test_quantile_sketch_guards_k_mismatch_and_q_range(spark):
    """Merging states built with different k silently corrupts the
    weighting (each anchor represents n/k of its group) — the merge
    must fail fast instead; quantiles_from_sketch must reject q
    outside [0, 1] rather than clamping to an arbitrary anchor."""
    import pytest

    from mcm_problem_f_data_wrangling_spark.operators.incremental import (
        merge_quantile_sketch_states,
        quantile_sketch_state,
        quantiles_from_sketch,
    )

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "g string, v double"
    )
    st8 = quantile_sketch_state(df, ["g"], "v", 8)
    st16 = quantile_sketch_state(df, ["g"], "v", 16)
    with pytest.raises(Exception, match="anchors, expected k=8"):
        merge_quantile_sketch_states(st8, st16, ["g"], 8).collect()
    with pytest.raises(Exception, match="anchors, expected k=16"):
        merge_quantile_sketch_states(st8, st16, ["g"], 16).collect()
    # matching k still merges fine (the guard passes rows through)
    assert merge_quantile_sketch_states(st8, st8, ["g"], 8).count() == 1
    for bad_q in (-0.01, 1.01):
        with pytest.raises(ValueError, match="0 <= q <= 1"):
            quantiles_from_sketch(st8, ["g"], [0.5, bad_q])
