"""Streaming dedup-at-ingest (engine extension — BASELINE.json north
star: LLM-training-data pipeline ops).

A training-data ingest pipeline dedupes documents AS THEY ARRIVE, not
in a nightly batch: the stream carries a content fingerprint and
``dropDuplicatesWithinWatermark`` keeps the first occurrence per
fingerprint, holding one (tiny) state row per fingerprint only until
the watermark passes — state is bounded by the watermark horizon, not
the corpus size.  The batch mirror is ``operators.dedup.
exact_dedup_groups`` / query ``x_dedup_exact_fingerprint``.

The reference repo is batch-only (see SURVEY.md §2.8); labeled
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import doc_fingerprint


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """fingerprint → ``dropDuplicatesWithinWatermark`` on it.

    Keeps the first-seen document per whitespace-normalized content
    fingerprint within the watermark horizon.  Duplicates arriving
    later than the horizon pass through (by design: bounded state —
    callers needing corpus-lifetime exactness run the batch
    ``exact_dedup_groups`` compaction downstream).
    """
    return (
        stream.withColumn("fp", doc_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
