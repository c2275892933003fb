"""Structured Streaming rollup == its batch mirror (SURVEY.md §2.8
extension): same input, same aggregates, via availableNow trigger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.streaming import streaming_tumbling_rollup
from mcm_problem_f_data_wrangling_spark.streaming.rollup import run_to_memory_sink


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    rows = [
        (i, f"2024-01-{(i % 5) + 1:02d} 10:00:00", i % 7, ["click", "view"][i % 2], float(i))
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value"]
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_stream_matches_batch(spark, event_dir):
    batch_df = spark.read.parquet(event_dir)
    expected = {
        (str(r["day"]), r["event_type"]): (r["n"], r["total"])
        for r in batch_df.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").cast("date").alias("day"), "event_type", "n", "total")
        .collect()
    }
    stream = streaming_tumbling_rollup(spark, event_dir, batch_df.schema)
    assert stream.isStreaming
    run_to_memory_sink(stream, "rollup_test")
    got = {
        (str(r["day"]), r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM rollup_test").collect()
    }
    assert got == expected
    assert len(got) == 10  # 5 days × 2 event types
