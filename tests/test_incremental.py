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
