"""Python Data Source connector (sources/pyds.py): partition planning,
determinism under re-partitioning (exactly-once contract), and
integration with the dedup operator family on generated corpora."""

from __future__ import annotations

import pytest

from mcm_problem_f_data_wrangling_spark.sources.pyds import (
    DOCS_SCHEMA,
    register_synthetic_docs,
)


@pytest.fixture(scope="module")
def docs(spark):
    register_synthetic_docs(spark)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", 3000)
        .option("n_partitions", 6)
        .option("seed", 7)
        .load()
    )


def test_schema_and_count(docs):
    assert docs.schema == DOCS_SCHEMA
    assert docs.count() == 3000
    assert docs.rdd.getNumPartitions() == 6


def test_rows_are_pure_function_of_seed_and_id(spark, docs):
    """Repartitioning the scan must not change any row — the retried/
    speculated-task safety property a generating source must hold."""
    other = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 3000)
        .option("n_partitions", 11)
        .option("seed", 7)
        .load()
    )
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in other.collect()}
    assert a == b


def test_seed_changes_content(spark, docs):
    other = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 3000)
        .option("n_partitions", 6)
        .option("seed", 8)
        .load()
    )
    a = docs.filter("doc_id = 42").first()["text"]
    b = other.filter("doc_id = 42").first()["text"]
    assert a != b


def test_planted_duplicates_found_by_dedup_operator(docs):
    """End-to-end: the corpus generator's dup_rate plants exact
    duplicates that exact_dedup_groups must recover."""
    from mcm_problem_f_data_wrangling_spark.operators.dedup import (
        exact_dedup_groups,
    )

    groups = exact_dedup_groups(docs, text_col="text", id_col="doc_id")
    n_docs = docs.count()
    n_fingerprints = groups.count()
    # dup_rate defaults to 5%: some dup clusters must exist, but far
    # fewer than 20% of the corpus collapses
    assert n_docs * 0.80 < n_fingerprints < n_docs
    clusters = groups.filter("n_docs > 1")
    assert clusters.count() > 0
    # the canonical survivor is the minimum doc_id of its cluster, so
    # it can never exceed any planted duplicate's id
    worst = clusters.selectExpr("max(keep_doc_id) AS m").first()["m"]
    assert worst < n_docs


def test_lang_lexicons_are_separable(docs):
    """Generated docs carry enough language signal for lang_id to beat
    chance by a wide margin (lexicons are disjoint-ish by design)."""
    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.functions.textfn import lang_id

    scored = docs.withColumn("pred", lang_id(F.col("text")))
    acc = scored.filter(F.col("pred") == F.col("lang")).count() / docs.count()
    assert acc > 0.5


def test_synthetic_events_stream_equals_batch(spark):
    """The streaming reader and the batch twin generate the SAME rows
    from pure offset arithmetic — any batch-boundary placement yields
    identical order-insensitive aggregates (s42's premise), and
    readBetweenOffsets replays a committed range byte-identically
    (the exactly-once path)."""
    import time
    import uuid

    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.sources.pyds import (
        SyntheticEventsStreamReader,
        register_synthetic_events,
    )

    register_synthetic_events(spark)
    n = 7_000
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_events", n).option("n_users", 13)
        .option("rows_per_batch", 1_999)  # deliberately ragged
        .load()
    )
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("total")
    )
    sink = "pyds_se_" + uuid.uuid4().hex[:6]
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            exc = q.exception()
            if exc is not None:  # dead stream: surface the real error
                raise exc
            r = spark.sql(f"SELECT SUM(cnt) AS s FROM {sink}").first()
            if r and r["s"] == n:
                break
            time.sleep(1)
        else:
            raise TimeoutError("stream did not converge")
    finally:
        q.stop()
    got = {
        r["user_id"]: (r["cnt"], r["total"])
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    spark.catalog.dropTempView(sink)
    batch = (
        spark.read.format("synthetic_events")
        .option("n_events", n).option("n_users", 13).load()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("cents").alias("total"))
    )
    want = {r["user_id"]: (r["cnt"], r["total"]) for r in batch.collect()}
    assert got == want
    # replay determinism: readBetweenOffsets == the original read
    rd = SyntheticEventsStreamReader({"n_events": 50, "rows_per_batch": 20})
    rows1, end1 = rd.read({"i": 0})
    assert list(rd.readBetweenOffsets({"i": 0}, end1)) == list(rows1)
    # bounded: past the end, empty batches at a fixed offset
    rows_end, off_end = rd.read({"i": 50})
    assert list(rows_end) == [] and off_end == {"i": 50}
