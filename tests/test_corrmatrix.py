"""Correlation matrix: numpy agreement, zero-variance, single scan."""

from __future__ import annotations

import numpy as np

from mcm_problem_f_data_wrangling_spark.operators.corrmatrix import corr_matrix


def test_corr_matrix_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.uniform(1, 100, 300).round(3)
    y = (x * 2 + rng.uniform(0, 10, 300)).round(3)
    z = rng.uniform(1, 100, 300).round(3)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(df, ["x", "y", "z"]).collect()}
    ref = np.corrcoef(np.vstack([x, y, z]))
    assert abs(got[("x", "y")] - ref[0, 1]) < 1e-4
    assert abs(got[("x", "z")] - ref[0, 2]) < 1e-4
    assert abs(got[("y", "z")] - ref[1, 2]) < 1e-4
    assert got[("x", "y")] > 0.95  # strongly correlated by construction


def test_corr_matrix_zero_variance_is_null(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, c double")
    row = corr_matrix(df, ["x", "c"]).collect()[0]
    assert row["corr"] is None


def test_corr_matrix_single_scan(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    plan = corr_matrix(df, ["a", "b", "c"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1
