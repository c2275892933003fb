"""Structured Streaming extension (SURVEY.md §2.8).

The reference is pure batch over monthly snapshot files — no streaming
surface exists in it.  This module is the clearly-labeled *extension*
the survey plans (§2.8, §7): the same tumbling-window rollup the batch
suite runs (``s08_tumbling_window_rollup``) expressed over
``readStream``, with a watermark for late data.  The batch mirror is
what the correctness oracle checks; the streaming variant is exercised
in tests with a file source + ``availableNow`` trigger (processes all
available data then stops — the batch-equivalent execution mode).

Scale notes: a tumbling event-time window with watermark keeps state
bounded to (watermark horizon / window size) windows per key; the
aggregation itself is the same partial/final hash agg as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def streaming_tumbling_rollup(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 day",
    watermark: str = "2 days",
) -> DataFrame:
    """readStream → watermark → tumbling window agg (count + sum).

    Returns the unstarted streaming DataFrame; callers attach a sink
    (tests use ``format("memory")`` + ``trigger(availableNow=True)``).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").cast("date").alias("day"), key_col, "n", "total")
    )


def run_to_memory_sink(stream_df: DataFrame, query_name: str) -> None:
    """Drain all available input into an in-memory table (batch-parity
    execution of the stream), blocking until complete."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
