"""SCD2 history: no-op collapse, interval chaining, current flag."""

from __future__ import annotations

import datetime as dt

from mcm_problem_f_data_wrangling_spark.operators.scd import scd2_history

T = dt.datetime


def test_scd2_collapses_noops_and_chains_intervals(spark):
    ev = spark.createDataFrame(
        [
            (1, T(2024, 1, 1), "bronze"),
            (1, T(2024, 2, 1), "bronze"),   # no-op: collapses
            (1, T(2024, 3, 1), "silver"),
            (1, T(2024, 4, 1), "gold"),
            (2, T(2024, 1, 15), "gold"),
        ],
        "user_id bigint, ts timestamp, tier string",
    )
    out = scd2_history(ev, ["user_id"], "ts", ["tier"]).collect()
    u1 = sorted([r for r in out if r["user_id"] == 1], key=lambda r: r["version"])
    assert [(r["tier"], r["version"]) for r in u1] == [
        ("bronze", 1), ("silver", 2), ("gold", 3)
    ]
    assert u1[0]["valid_from"] == T(2024, 1, 1)
    assert u1[0]["valid_to"] == T(2024, 3, 1)      # bronze runs until silver
    assert u1[1]["valid_to"] == T(2024, 4, 1)
    assert u1[2]["valid_to"] is None and u1[2]["is_current"] == 1
    assert sum(r["is_current"] for r in u1) == 1
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] == 1


def test_scd2_reverting_value_opens_new_version(spark):
    ev = spark.createDataFrame(
        [
            (1, T(2024, 1, 1), "a"),
            (1, T(2024, 2, 1), "b"),
            (1, T(2024, 3, 1), "a"),   # back to 'a': NEW version, not merged
        ],
        "user_id bigint, ts timestamp, v string",
    )
    out = scd2_history(ev, ["user_id"], "ts", ["v"]).collect()
    assert [(r["v"], r["version"]) for r in sorted(out, key=lambda r: r["version"])] == [
        ("a", 1), ("b", 2), ("a", 3)
    ]


def test_scd2_single_shuffle(spark):
    ev = spark.createDataFrame(
        [(1, T(2024, 1, 1), "a")], "user_id bigint, ts timestamp, v string"
    )
    plan = (
        scd2_history(ev, ["user_id"], "ts", ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 1
