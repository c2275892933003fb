"""operators/prefix.py — two-pass order statistics vs the naive
single-task global window, row for row.

The helpers exist because the naive window serializes at scale; these
tests pin that the parallel rewrite is SEMANTICALLY identical on
awkward shapes: duplicates in the value column (order stays total via
the id tie-break), negative values, empty input, input smaller than
the bucket count (empty range partitions), and a bucket count of 1
(degenerates to the naive plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.prefix import (
    global_lag,
    global_row_number,
    global_running_sum,
)


def _df(spark, n=500, seed=7):
    # deterministic pseudo-random values with heavy duplication
    return spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id", F.lit(seed)) % 13).alias("v"),
    )


@pytest.mark.parametrize("n,buckets", [(500, 32), (500, 1), (5, 32), (0, 8)])
def test_global_row_number_matches_window(spark, n, buckets):
    df = _df(spark, n)
    order = [F.col("v"), F.col("id")]
    got = {
        (r["id"], r["rank"])
        for r in global_row_number(df, order, n_buckets=buckets).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,buckets", [(500, 32), (5, 32)])
def test_global_running_sum_matches_window(spark, n, buckets):
    df = _df(spark, n)  # v can be negative: xxhash64 % 13 keeps sign
    order = [F.desc("v"), F.col("id")]
    got = {
        (r["id"], r["run"])
        for r in global_running_sum(df, order, "v", out="run", n_buckets=buckets).collect()
    }
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r["id"], r["run"])
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("n,buckets", [(500, 32), (500, 1), (5, 32)])
def test_global_lag_matches_window(spark, n, buckets):
    df = _df(spark, n)
    order = [F.col("v"), F.col("id")]
    got = {
        (r["id"], r["prev"])
        for r in global_lag(df, order, "v", out="prev", n_buckets=buckets).collect()
    }
    w = Window.orderBy(*order)
    want = {
        (r["id"], r["prev"])
        for r in df.withColumn("prev", F.lag("v").over(w)).collect()
    }
    assert got == want
    # exactly one global first row with NULL prev
    assert sum(1 for _, p in got if p is None) == (1 if n else 0)


def _null_df(spark, n=300):
    # every 3rd value NULL, including long NULL runs at the head so
    # some range partitions start with (or consist entirely of) NULLs
    return spark.range(n).select(
        "id",
        F.when(
            (F.col("id") < 40) | (F.col("id") % 3 == 0), F.lit(None)
        ).otherwise(F.xxhash64("id") % 13).alias("v"),
    )


@pytest.mark.parametrize("buckets", [32, 1])
def test_global_lag_preserves_mid_sequence_nulls(spark, buckets):
    # a NULL predecessor VALUE must stay NULL — only a partition's
    # FIRST row takes the boundary backfill (round-4 review finding)
    df = _null_df(spark)
    order = [F.col("id")]
    got = {
        (r["id"], r["prev"])
        for r in global_lag(df, order, "v", out="prev", n_buckets=buckets).collect()
    }
    w = Window.orderBy("id")
    want = {
        (r["id"], r["prev"])
        for r in df.withColumn("prev", F.lag("v").over(w)).collect()
    }
    assert got == want


@pytest.mark.parametrize("buckets", [32, 1])
def test_global_running_sum_null_prefix(spark, buckets):
    # native running sum is NULL until the first non-null value and
    # skips NULLs afterwards; the stitch must not turn leading NULLs
    # into zeros (round-4 review finding)
    df = _null_df(spark)
    order = [F.col("id")]
    got = {
        (r["id"], r["run"])
        for r in global_running_sum(df, order, "v", out="run", n_buckets=buckets).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r["id"], r["run"])
        for r in df.withColumn("run", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_decimal_running_sum_exact(spark):
    # the a12 shape: decimal(18,6) values stay exact through the
    # partial sums and the offset stitch (sum widens precision by 10
    # and the stitch add by 1 — far below the 38 cap, so no scale
    # clamping; a scale-20 input WOULD clamp, documented in prefix.py)
    df = spark.range(200).select(
        "id",
        ((F.col("id") * 13 % 997).cast("decimal(18,6)") * F.lit(1.25)).cast(
            "decimal(18,6)"
        ).alias("d"),
    )
    order = [F.desc("d"), F.col("id")]
    got = global_running_sum(df, order, "d", out="run").orderBy("id").collect()
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.withColumn("run", F.sum("d").over(w)).orderBy("id").collect()
    assert [(r["id"], r["run"]) for r in got] == [(r["id"], r["run"]) for r in want]


@pytest.mark.parametrize("n", [1, 3, 9, 10, 11, 19, 20, 21, 37, 100])
def test_ntile_remainder_rule_matches_native(spark, n):
    # the x_histogram_equi_depth decile formula: NTILE(10) recovered
    # from the global rank via the SQL-standard remainder rule must
    # agree with Spark's native NTILE for every n (first n%10 buckets
    # get ceil(n/10) rows)
    df = spark.range(n).select((F.col("id") + 1).alias("rank"))
    size, rem = n // 10, n % 10
    big = rem * (size + 1)
    formula = (
        F.when(F.col("rank") <= big, F.ceil(F.col("rank") / F.lit(size + 1)))
        .otherwise(F.lit(rem) + F.ceil((F.col("rank") - big) / F.lit(size)))
        .cast("int")
    )
    got = {r["rank"]: r["d"] for r in df.select("rank", formula.alias("d")).collect()}
    w = Window.orderBy("rank")
    want = {
        r["rank"]: r["d"]
        for r in df.select("rank", F.ntile(10).over(w).alias("d")).collect()
    }
    assert got == want
