"""Skew-resistant helpers: semantics must equal the unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.skew import (
    salt_replicated_join,
    salted_group_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key carrying 90% of rows, plus a long tail
    rows = [("hot", float(i % 7)) for i in range(9000)]
    rows += [(f"k{i % 50}", float(i % 11)) for i in range(1000)]
    return spark.createDataFrame(rows, ["key", "value"])


def test_salted_agg_matches_plain(skewed):
    plain = {
        (r["key"]): (r["s"], r["n"])
        for r in skewed.groupBy("key")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r["key"]): (r["s"], r["n"])
        for r in salted_group_agg(
            skewed,
            ["key"],
            {"s": F.sum(F.col("value").cast("decimal(18,6)")), "n": F.count(F.lit(1))},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_two_exchanges(skewed):
    plan = salted_group_agg(
        skewed, ["key"], {"n": F.count(F.lit(1))}, n_salts=8
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") >= 2  # (key,salt) shuffle then key shuffle


def test_salt_replicated_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], ["key", "label"]
    )
    plain = (
        skewed.join(dim, "key", "left")
        .groupBy("label")
        .count()
        .collect()
    )
    salted = (
        salt_replicated_join(skewed, dim, "key", n_salts=8, how="left")
        .groupBy("label")
        .count()
        .collect()
    )
    assert {tuple(r) for r in plain} == {tuple(r) for r in salted}


def test_bucketed_join_is_shuffle_free(spark, skewed):
    from mcm_problem_f_data_wrangling_spark.sources.writers import write_bucketed_table

    dim = skewed.select("key").distinct().withColumn("label", F.upper("key"))
    try:
        write_bucketed_table(skewed, "t_fact_b", ["key"], n_buckets=4)
        write_bucketed_table(dim, "t_dim_b", ["key"], n_buckets=4)
        fact_t, dim_t = spark.table("t_fact_b"), spark.table("t_dim_b")
        # disable broadcast so the co-location (not a broadcast) avoids the shuffle
        joined = fact_t.hint("merge").join(dim_t, "key").groupBy("label").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert plan.count("Bucketed: true") == 2
        # join inputs are printed below the SortMergeJoin node; neither may
        # be re-shuffled (the only allowed Exchange is the final groupBy's)
        below_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in below_join
        assert {tuple(r) for r in joined.collect()} == {
            tuple(r) for r in skewed.join(dim, "key").groupBy("label").count().collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS t_fact_b")
        spark.sql("DROP TABLE IF EXISTS t_dim_b")


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE skew-join handling: with a 90%-hot key and thresholds scaled
    to test data, the final adaptive plan must mark the skewed
    partition split (skew=true) — this is the runtime half of the skew
    story (operators/skew.py salting is the compile-time half)."""
    restore = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        left = spark.range(100_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 7 ELSE id % 1000 END AS k",
            "id AS payload",
        )
        right = spark.range(1000).selectExpr("id AS k", "id * 2 AS attr")
        joined = left.join(right, "k")
        # execute through THIS frame's own QueryExecution (count()/write
        # build separate query trees whose adaptive plans finalize
        # independently) — toPandas collects via the same _jdf
        n = len(joined.toPandas())
        assert n == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in restore.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
