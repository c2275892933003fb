"""Distributed inverted-index construction over a document corpus.

A search/index build is the classic "explode then re-group" shape: the
term-document pair table is ~tokens(corpus) rows, far larger than the
corpus itself, and naive formulations shuffle all of it twice.  This
implementation:

- pre-aggregates (term, doc) term frequencies BEFORE the per-term
  group (map-side combinable; the second shuffle moves one row per
  distinct (term, doc), not one per token occurrence);
- builds posting lists per term AFTER the (term)-keyed exchange, so no
  global sort exists anywhere in the plan;
- caps the materialized posting list at ``k`` entries BEFORE the
  collect: a per-term ``row_number`` marks the first ``k`` doc ids and
  ``collect_list`` only sees those (``collect_list`` skips the NULLs
  the guard produces for the rest), so a celebrity term's aggregation
  buffer holds ``k`` entries, never its full document list — the
  classic index-build OOM.  The window and the aggregate share the
  same term-hash exchange (the window's sort is within partitions).
  ``df_count``/``tf_total`` remain exact over ALL occurrences.

At 100 TB the plan is one scan + two key-partitioned exchanges whose
second stage carries O(vocab × avg_df) rows — the same shape Lucene/
Anserini shard builds use on MapReduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inverted_index(
    docs: DataFrame,
    tokens_col: Column,
    id_col: str = "doc_id",
    min_df: int = 1,
    postings_cap: int = 20,
) -> DataFrame:
    """Build ``(term, df_count, tf_total, postings)`` from a corpus.

    ``postings`` is the first ``postings_cap`` doc ids (ascending) as a
    comma-joined string — string form keeps the value portable across
    engines and hash-comparable by the driver.
    """
    from pyspark.sql import Window

    td = (
        docs.select(F.col(id_col), F.explode(tokens_col).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # bound the collect BEFORE aggregation: only the first `cap` doc
    # ids per term (by rank) reach collect_list's buffer
    rn = F.row_number().over(Window.partitionBy("term").orderBy(id_col))
    capped = td.withColumn(
        "__pid", F.when(rn <= postings_cap, F.col(id_col))
    )
    return (
        capped.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_count"),
            F.sum("tf").cast("long").alias("tf_total"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("__pid")))
            ).alias("postings"),
        )
        .filter(F.col("df_count") >= min_df)
    )
