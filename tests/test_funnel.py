"""Ordered funnel: strict-ordering semantics and single-shuffle plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.funnel import funnel_conversion

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")


def _steps():
    return [
        ("a", F.col("event_type") == "a"),
        ("b", F.col("event_type") == "b"),
        ("c", F.col("event_type") == "c"),
    ]


def test_funnel_requires_strict_order(spark):
    ev = _ev(
        spark,
        [
            # u1 completes a->b->c in order
            (1, T(2024, 1, 1, 0), "a"), (1, T(2024, 1, 1, 1), "b"), (1, T(2024, 1, 1, 2), "c"),
            # u2 has b BEFORE a: b must not count; no later b, funnel stops at a
            (2, T(2024, 1, 1, 1), "b"), (2, T(2024, 1, 1, 2), "a"),
            # u3: c before b: a->b complete, c not (c precedes b-completion)
            (3, T(2024, 1, 1, 0), "a"), (3, T(2024, 1, 1, 1), "c"), (3, T(2024, 1, 1, 2), "b"),
            # u4 never does a but does b/c: enters funnel, completes nothing
            (4, T(2024, 1, 1, 0), "b"), (4, T(2024, 1, 1, 1), "c"),
        ],
    )
    out = {r["stage"]: r for r in funnel_conversion(ev, _steps()).collect()}
    assert out["a"]["n_entered"] == 4 and out["a"]["n_users"] == 3
    assert out["b"]["n_entered"] == 3 and out["b"]["n_users"] == 2  # u1, u3
    assert out["c"]["n_entered"] == 2 and out["c"]["n_users"] == 1  # u1 only


def test_funnel_same_timestamp_does_not_advance(spark):
    ev = _ev(spark, [(1, T(2024, 1, 1), "a"), (1, T(2024, 1, 1), "b")])
    out = {r["stage"]: r["n_users"] for r in funnel_conversion(ev, _steps()).collect()}
    assert out == {"a": 1, "b": 0, "c": 0}


def test_funnel_single_user_exchange(spark):
    ev = _ev(spark, [(1, T(2024, 1, 1), "a")])
    plan = funnel_conversion(ev, _steps())._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange on user_id (+ the final single-partition agg)
    assert plan.count("hashpartitioning(user_id") <= 1
