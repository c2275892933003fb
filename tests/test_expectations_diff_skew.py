"""Expectations report, snapshot diff, and key-skew profile:
behavioral tests beyond the oracle (violation counting, change
classification incl. NULL transitions, skew math)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.cdc import snapshot_diff
from mcm_problem_f_data_wrangling_spark.operators.expectations import (
    expectations_report,
)
from mcm_problem_f_data_wrangling_spark.operators.skew import key_skew_profile


def _report(spark, df, **kw):
    return {r["check_name"]: r for r in expectations_report(df, **kw).collect()}


def test_expectations_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "F"),   # range violation
            (2, 999.0, "X"),  # dup key + set violation
            (None, None, None),  # null key; null price/status don't violate range/set
        ],
        "k bigint, price double, status string",
    )
    dim = spark.createDataFrame([(1,), (2,)], "pk bigint")
    rep = _report(
        spark,
        df,
        not_null=("k",),
        ranges={"price": (0, 100)},
        in_set={"status": ("O", "F")},
        unique=(("k",),),
        references=(("k", dim, "pk"),),
    )
    assert rep["not_null:k"]["n_violations"] == 1
    assert rep["not_null:k"]["passed"] == 0
    assert rep["range:price"]["n_violations"] == 2  # -5 and 999
    assert rep["in_set:status"]["n_violations"] == 1  # 'X'; NULL not counted
    # 4 rows, 3 distinct non-null k... COUNT(DISTINCT k) ignores NULL -> 2
    assert rep["unique:k"]["n_violations"] == 4 - 2
    # NULL fk never matches dim -> orphan
    assert rep["fk:k"]["n_violations"] == 1
    assert all(r["n_rows"] == 4 for r in rep.values())


def test_expectations_all_pass(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "k bigint, v double")
    rep = _report(spark, df, not_null=("k", "v"), ranges={"v": (0, 10)}, unique=(("k",),))
    assert all(r["passed"] == 1 and r["n_violations"] == 0 for r in rep.values())


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0)], "k bigint, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, 30.0), (5, 50.0)], "k bigint, v double"
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert set(out) == {2, 3, 4, 5}  # key 1 unchanged -> dropped
    assert out[2]["change_type"] == "update" and out[2]["new_v"] == 21.0
    assert out[3]["change_type"] == "update"  # NULL -> 30.0 is an update (null-safe)
    assert out[4]["change_type"] == "delete" and out[4]["new_v"] is None
    assert out[5]["change_type"] == "insert" and out[5]["old_v"] is None


def test_snapshot_diff_null_to_null_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k bigint, v double")
    new = spark.createDataFrame([(1, None)], "k bigint, v double")
    assert snapshot_diff(old, new, ["k"], ["v"]).count() == 0


def test_key_skew_profile_math(spark):
    # key 7 appears 6x, key 8 3x, keys 1..3 once each -> 5 keys, 12 rows
    rows = [(7,)] * 6 + [(8,)] * 3 + [(1,), (2,), (3,)]
    df = spark.createDataFrame(rows, "k bigint")
    out = key_skew_profile(df, ["k"], top_k=2).collect()
    assert [(r["k"], r["cnt"]) for r in out] == [(7, 6), (8, 3)]
    top = out[0]
    assert top["n_keys"] == 5 and top["n_rows"] == 12 and top["max_cnt"] == 6
    assert abs(top["skew_factor"] - 6 * 5 / 12) < 1e-12
    assert abs(top["share"] - 6 / 12) < 1e-12


def test_key_skew_profile_tiebreak_deterministic(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k bigint")
    out = key_skew_profile(df, ["k"], top_k=2).collect()
    assert [r["k"] for r in out] == [1, 2]  # equal counts -> key ascending
