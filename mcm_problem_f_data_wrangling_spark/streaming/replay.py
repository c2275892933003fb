"""Event-time-ordered file replay for deterministic watermark tests.

Watermark-driven semantics (outer-join null-padding, state eviction,
late-data drops) are only observable — and only DETERMINISTIC — when
the replayed input is event-time-ordered across micro-batches: the
file source feeds batches in modification-time order, the watermark
advances between batches from each batch's max event time, and any
row older than the advanced watermark would be silently dropped.
This module writes a DataFrame as N range-partitioned parquet files
whose mtime order equals their event-time order, then appends
far-future SENTINEL files that flush the watermark past all real
data: sentinel batch k advances the watermark at its end, and the
NEXT batch performs the eviction — two sentinels guarantee every
real row's outer/null-padded result has emitted by end-of-stream
(engine extension; the reference repo is batch-only, SURVEY.md §2.8).

BATCHING CAVEAT: the two sentinels must land in DIFFERENT
micro-batches for the eviction to run in a real batch.  With
``maxFilesPerTrigger`` sized so both sentinel files fall into one
trailing batch, the watermark only advances at that batch's end and
the eviction then silently relies on Spark's trailing no-data
micro-batch (``spark.sql.streaming.noDataMicroBatches.enabled``,
default true).  Callers should size ``maxFilesPerTrigger`` as
``n_files + n_sentinels - 1`` so the LAST sentinel forms its own
batch (the s36 gate does exactly this: [data + sentinel 1] advances
the watermark, [sentinel 2] evicts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _parquet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def restamp_replay_sequence(ordered: list[str]) -> list[str]:
    """Re-stamp ``ordered`` (replay files possibly spanning SEVERAL
    ``write_ordered_replay`` dirs) with one strictly increasing
    all-in-the-past mtime sequence, 10 s apart.

    Each ``write_ordered_replay`` call stamps only its own files, so
    two dirs written back-to-back can interleave when copied into one
    source directory (``copy2`` preserves mtimes) — the s39 resume
    gate splits its replay at the restart point into two dirs and
    needs the combined sequence ordered.  Inputs must be existing
    (already mtime-stamped) files — typically the concatenation of
    ``write_ordered_replay`` return lists.  Returns ``ordered``.
    """
    if not ordered:
        raise ValueError(
            "restamp_replay_sequence: ordered is empty — pass the "
            "concatenated write_ordered_replay file lists"
        )
    base = os.stat(ordered[-1]).st_mtime - 10.0 * len(ordered)
    for i, f in enumerate(ordered):
        os.utime(f, (base + 10.0 * i, base + 10.0 * i))
    return ordered


def write_ordered_replay(
    df: DataFrame,
    ts_col: str,
    path: str,
    n_files: int = 3,
    sentinel_df: DataFrame | None = None,
    n_sentinels: int = 2,
) -> list[str]:
    """Write ``df`` to ``path`` as ``n_files`` event-time-range
    parquet files with strictly increasing mtimes (file k's max ts <=
    file k+1's min ts), then ``n_sentinels`` copies of ``sentinel_df``
    (rows the caller builds with FAR-FUTURE ``ts_col`` values and a
    recognizable key to filter downstream) with later mtimes still.

    ``repartitionByRange`` puts range i in task i (= ``part-0000i``),
    but the mtime stamps are ordered by each file's actual min ts so
    the replay order never depends on output-file naming.  Returns
    the stamped file list in replay order.
    """
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    df.repartitionByRange(n_files, F.col(ts_col)).write.mode(
        "overwrite"
    ).parquet(path)
    import pyarrow.parquet as pq

    def min_ts(f: str):
        t = pq.read_table(f, columns=[ts_col])
        # empty range partitions sort last (their replay slot is moot)
        return (1,) if t.num_rows == 0 else (0, min(t.column(ts_col).to_pylist()))

    ordered = sorted(_parquet_files(path), key=lambda f: (min_ts(f), f))
    if sentinel_df is not None:
        for _ in range(n_sentinels):
            before = set(_parquet_files(path))
            sentinel_df.coalesce(1).write.mode("append").parquet(path)
            new = sorted(set(_parquet_files(path)) - before)
            ordered.extend(new)
    # strictly increasing mtimes, 10 s apart and ALL IN THE PAST —
    # the file source orders by modification time, and both streams
    # of a two-source query list the SAME directory, so this one
    # ordering drives both.  Stamping PAST times matters: a source
    # that initializes before a file's (future) mtime can latch an
    # availableNow snapshot that excludes it, and with two sources
    # initializing at different instants the streams then diverge
    base = os.stat(ordered[-1]).st_mtime - 10.0 * len(ordered)
    for i, f in enumerate(ordered):
        os.utime(f, (base + 10.0 * i, base + 10.0 * i))
    return ordered
