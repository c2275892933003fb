"""Train/eval decontamination by k-gram overlap.

A training corpus must not contain the evaluation benchmarks it will
be scored on; the standard check (GPT-3 appendix C, PaLM §8, Llama 2
A.6) flags any training document sharing at least one k-word shingle
with any eval document.  Not in the reference (pure CES pipeline) —
an engine extension on the BASELINE.json training-data north star.

Scale shape: the eval side is tiny (benchmarks: 1e3-1e6 docs) against
a 100 TB train side, so the eval (doc, shingle-hash) pairs are
broadcast and the train side streams through a broadcast-hash join —
no shuffle of the big side at all.  Shingles are hashed to 64-bit
before the join so the broadcast payload and the join keys are fixed
8-byte values, not strings.

Strictness: documents shorter than k tokens contribute NO shingles
(the MinHash ``word_shingles`` whole-text fallback would turn every
short eval doc into a pseudo-shingle and flag spurious matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import portable_hash64, strict_word_shingles


def _shingle_pairs(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, h) pairs: distinct k-gram hashes per document."""
    return df.select(
        F.col(id_col),
        F.explode(F.array_distinct(strict_word_shingles(text_col, k))).alias("ng"),
    ).select(F.col(id_col), portable_hash64("ng").alias("h"))


def ngram_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Flag training docs overlapping the eval set on any k-word shingle.

    Output (contaminated docs only):
    (doc_id, n_shared_ngrams, n_eval_docs) — how many distinct
    shingles leak and how many eval documents are implicated; both
    drive the usual remediation choice (drop doc vs. excise span).
    """
    ev = F.broadcast(
        _shingle_pairs(eval_df, text_col, id_col, k).withColumnRenamed(
            id_col, "eval_id"
        )
    )
    tr = _shingle_pairs(train, text_col, id_col, k)
    return (
        tr.join(ev, "h")
        .groupBy(id_col)
        .agg(
            F.countDistinct("h").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
    )
