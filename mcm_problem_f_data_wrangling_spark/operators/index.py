"""Distributed inverted-index construction over a document corpus.

A search/index build is the classic "explode then re-group" shape: the
term-document pair table is ~tokens(corpus) rows, far larger than the
corpus itself, and naive formulations shuffle all of it twice.  This
implementation:

- pre-aggregates (term, doc) term frequencies BEFORE the per-term
  group (map-side combinable; the second shuffle moves one row per
  distinct (term, doc), not one per token occurrence);
- builds posting lists with ``sort_array(collect_list(...))`` — the
  list is assembled per term AFTER the (term)-keyed exchange, so no
  global sort exists anywhere in the plan;
- caps the materialized posting list at ``k`` entries (the long tail
  of a posting list is only ever consumed lazily by a real search
  engine; materializing celebrity-term postings in full is the
  classic index-build OOM).  ``df_count``/``tf_total`` remain exact
  over ALL occurrences.

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
    td = (
        docs.select(F.col(id_col), F.explode(tokens_col).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        td.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_count"),
            F.sum("tf").cast("long").alias("tf_total"),
            F.concat_ws(
                ",",
                F.slice(F.sort_array(F.collect_list(F.col(id_col))), 1, postings_cap),
            ).alias("postings"),
        )
        .filter(F.col("df_count") >= min_df)
    )
