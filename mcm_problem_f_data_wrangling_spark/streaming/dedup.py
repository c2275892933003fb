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


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list,
    left_ts: str,
    right_ts: str,
    lookback_seconds: float,
    watermark: str = "2 hours",
    how: str = "inner",
    direction: str = "lookback",
) -> DataFrame:
    """Stream-stream interval join: right rows within
    ``lookback_seconds`` BEFORE each left row (``direction=
    'lookback'``) or AFTER it (``'lookforward'``), per key — e.g.
    attribute a click to the views that preceded it while both are in
    flight.  For ``how='inner'`` a look-forward window is the same
    operator with the roles swapped; for OUTER joins the sides are no
    longer symmetric (the outer side is the one that must emit
    unmatched), so the direction is a real parameter.

    ``how='left_outer'`` is the attribution-pipeline staple — every
    left row emits exactly once, null-padded if no right row landed in
    its window.  The null-padded rows are produced by WATERMARK-DRIVEN
    STATE EVICTION: a buffered left row emits as unmatched only once
    the watermark proves no matching right row can still arrive (right
    watermark past ``left_ts + window``), so with an unbounded
    watermark the unmatched rows never surface and with late
    (out-of-order) data past the delay they are silently dropped —
    replay event-time-ordered input and a real delay to get exact
    batch-join parity (the s36 gate does exactly this).

    Both sides carry watermarks and the join condition time-bounds the
    match, so each side's buffered state is evicted once the other
    side's watermark passes ``lookback + watermark`` — without the
    time bound a stream-stream join buffers FOREVER (state = whole
    stream), which is the classic way this operator falls over in
    production.  Caller supplies distinct column names across sides;
    each ``on`` entry is either a name present on both sides or a
    ``(left_col, right_col)`` pair (pre-renamed sides keep the joined
    row free of duplicate columns).
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join type: {how!r}")
    if direction not in ("lookback", "lookforward"):
        raise ValueError(f"unsupported direction: {direction!r}")
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    lsec = F.col(left_ts).cast("double")
    rsec = F.col(right_ts).cast("double")
    w = F.lit(float(lookback_seconds))
    if direction == "lookback":
        cond = (rsec >= lsec - w) & (rsec <= lsec)
    else:
        cond = (rsec >= lsec) & (rsec <= lsec + w)
    for k in on:
        lk, rk = k if isinstance(k, tuple) else (k, k)
        cond = cond & (l[lk] == r[rk])
    return l.join(r, cond, how)


def foreach_batch_idempotent_parquet(
    stream: DataFrame, path: str, checkpoint: str, output_mode: str = "append"
):
    """Exactly-once-ish parquet sink via ``foreachBatch``: each
    micro-batch lands in its own ``epoch=<id>`` directory with
    ``overwrite`` mode, so a RE-DELIVERED epoch (restart between sink
    write and offset commit — Structured Streaming's at-least-once
    window) overwrites its own output instead of appending duplicates.
    Idempotent-by-epoch is the standard recipe when the sink has no
    transactional commit protocol of its own.

    ``output_mode`` is forwarded to the writer: the default
    ``'append'`` suits joins/dedup; update-mode stateful operators
    (``applyInPandasWithState``) refuse Append and need ``'update'``.

    Returns the (unstarted) ``DataStreamWriter``.
    """

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{path}/epoch={epoch_id}")

    return (
        stream.writeStream.foreachBatch(write_batch)
        # update-mode stateful operators (applyInPandasWithState)
        # refuse the default Append mode — callers pass 'update'
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
