"""Overlapping document chunking (RAG / training-context windowing).

Splitting a corpus into fixed-token windows with overlap is the
standard retrieval/pretraining prep step (LangChain's recursive
splitter, RAG context windows, T5-style span packing all reduce to
it).  The whole operator is a row-local projection — tokenize, window
starts via ``sequence``, slice per start — followed by one
``posexplode``; NOTHING shuffles.  At 100 TB the output is
``ceil(n/stride)`` rows per document produced entirely map-side, so
chunking composes with downstream dedup/packing without adding an
exchange of its own.

Tail semantics: window starts are ``0, stride, 2·stride, …`` while
``start < n_tokens``; the last windows may be shorter than
``chunk_tokens`` (no padding, no dropped tail — every token appears in
at least one chunk when ``stride <= chunk_tokens``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode documents into overlapping token windows.

    Output: ``(id, chunk_id, start_token, n_tokens, chunk_text)`` with
    ``chunk_id = start_token / stride`` (dense per doc).  Empty
    documents produce no rows.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # Project the token array ONCE (r12): ``words`` is captured inside
    # the per-start transform lambda, and a free subtree inside a HOF
    # lambda re-evaluates PER ELEMENT — tokenize ran once per chunk
    # instead of once per document (measured 0.65 s -> 0.44 s at
    # sf0.1, rows identical; the same capture bug cost x_bigram_lm 9×).
    words = F.col("__w")
    n = F.size(words)
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    chunks: Column = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice(words, s + 1, chunk_tokens), " ").alias("text"),
        ),
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
        .filter(n > 0)
        .select(F.col(id_col), n.alias("__n"), F.posexplode(chunks).alias("chunk_id", "__c"))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("__c.start").cast("long").alias("start_token"),
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__c.start"))
            .cast("long")
            .alias("n_tokens"),
            F.col("__c.text").alias("chunk_text"),
        )
    )
