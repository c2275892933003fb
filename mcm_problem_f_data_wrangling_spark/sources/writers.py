"""Sinks (SURVEY.md §2.1, S5-S6).

- S5 CSV sink: the reference writes one file per output
  (``df.to_csv(path, index=False)``, ``bls_ces/prep_CES_pandas.py:183``).
  Single-file semantics require ``coalesce(1)`` — fine for the
  reference's ~1k-row parity outputs, documented as non-scalable
  (SURVEY.md §7 hard parts).  ``write_parquet`` is the scale path.
- S6 Excel sink (``EDA.ipynb cell 33``): no native distributed writer
  exists; small result sets are collected to pandas on the driver.
  openpyxl is not in this container, so the Excel path is gated behind
  an import-try and raises a clear error when unavailable.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Scale-path sink: columnar, splittable, partition-prunable."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> str:
    """S5: single-file CSV with pandas ``to_csv`` semantics.

    Writes via a temp directory then renames the lone part file to
    ``path``.  Deliberately ``coalesce(1)`` — parity with the
    reference's one-file outputs; use :func:`write_parquet` for bulk.
    """
    tmp = path + "._spark_tmp"
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .csv(tmp)
    )
    part = glob.glob(os.path.join(tmp, "part-*.csv"))[0]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(tmp, ignore_errors=True)
    return path


def write_excel_sheets(frames: dict[str, DataFrame], path: str) -> str:
    """S6: multi-sheet Excel export (``EDA.ipynb cell 33``).

    Collects each (small) DataFrame to pandas on the driver — the same
    place the reference materializes them — one sheet per key.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "Excel sink requires openpyxl (not installed in this container); "
            "use write_csv_single or write_parquet instead"
        ) from exc
    import pandas as pd

    with pd.ExcelWriter(path, engine="openpyxl") as writer:  # pragma: no cover
        for sheet, df in frames.items():
            df.toPandas().to_excel(writer, sheet_name=sheet[:31], index=False)
    return path


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: the shuffle-free co-located join path.

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT an exchange — at 100 TB the repeated fact⨝dict join
    (SURVEY.md §2.3 J3) amortizes its shuffle into this one-time
    layout.  Requires ``saveAsTable`` (bucket metadata lives in the
    catalog, not the parquet files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """JSON-lines sink (engine extension): one JSON object per line,
    one file per task — the interchange format training pipelines
    expect.  ``partition_by`` gives hive-style ``key=value`` dirs so a
    downstream ``read_jsonl`` prunes partitions from the path alone."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def compact_parquet(
    spark,
    path: str,
    out_path: str | None = None,
    target_file_bytes: int = 512 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Small-file compaction — the table-maintenance pass a 100 TB
    lake needs continuously: streaming/incremental ingest leaves
    thousands of KB-scale files whose footer/scheduling/listing
    overhead dominates scan cost.  Rewrites the dataset into
    ``ceil(total_bytes / target_file_bytes)`` files (sized on the
    EXISTING compressed bytes, not row counts, so heterogeneous row
    widths don't skew file sizes).

    ``cluster_by`` additionally sorts within output partitions so
    parquet min/max zone maps become selective on those columns —
    cheap clustering without a full global sort.

    Returns the output file count.  Writes to ``out_path`` (or
    ``path + '.compacted'``): an in-place rewrite that crashes midway
    would destroy the only copy; callers swap directories after
    success (the pattern table formats automate with commits).
    """
    import math

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if cluster_by:
        # range partitioning (not hash): each output file owns a
        # DISJOINT slice of the cluster key, so parquet min/max zone
        # maps actually prune — hash repartition + sort gives every
        # file a uniform sample of the key space and prunes nothing
        df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        df = df.repartition(n)
    dest = out_path or (path.rstrip("/") + ".compacted")
    df.write.mode("overwrite").parquet(dest)
    return len(glob.glob(os.path.join(dest, "*.parquet")))
