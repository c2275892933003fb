"""Multimodal column plumbing (engine extension, BASELINE.json north
star): image/audio/video as opaque ``binary`` columns with typed
metadata.

The Spark-side plumbing — schema, batching, partition sizing, UDF
signatures — is real and tested; the actual media decode is STUBBED
(image/audio libraries are not in this container).  The stub is a
deterministic fake keyed on content bytes, clearly marked, so the
pipeline shape (decode → feature-extract → resize/frame-sample) can be
exercised end-to-end and swapped for a real decoder (PIL/ffmpeg) by
replacing one function.

Design for scale:
- media rows are *heavy*; ``media_repartition_hint`` sizes partitions
  by bytes, not rows, so one Arrow batch stays within executor memory.
- decode runs in ``mapInPandas`` (Arrow-batched iterator, streaming
  per-batch — never materializes a whole partition).
- metadata (byte length, content hash, magic-prefix sniff) stays
  JVM-side — no Python for the cheap 99%.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("source_uri", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata: byte length, md5, magic-byte prefix.

    Runs before any Python boundary — filtering/dedup on these columns
    prunes the expensive decode stage.
    """
    p = F.col(payload_col)
    return df.withColumns(
        {
            "byte_len": F.octet_length(p).cast("long"),
            "content_md5": F.md5(p),
            "magic_hex": F.lower(F.hex(F.substring(p, 1, 4))),
        }
    )


def media_repartition_hint(df: DataFrame, target_bytes_per_partition: int = 128 * 1024 * 1024, avg_payload_bytes: int = 1 * 1024 * 1024) -> DataFrame:
    """Size partitions by payload bytes so Arrow batches fit in memory.

    At 100 TB a rows-based default (e.g. 128 MB of *parquet* per task)
    under-counts decoded size; callers pass the measured average
    payload size and the partition count is derived from total payload
    bytes / target.  Costs one count() action — cheap next to the
    decode stage it protects.
    """
    import math

    total_rows = df.count()
    n = max(
        1, math.ceil(total_rows * max(1, avg_payload_bytes) / target_bytes_per_partition)
    )
    return df.repartition(n)


def _fake_decode(payload: bytes, media_type: str) -> tuple[int, int, int, float]:
    """STUB decoder — deterministic fake keyed on content bytes.

    Replace with PIL/libav in production.  Raises for unknown types the
    same way a real decoder would.
    """
    if media_type not in {"image", "audio", "video"}:
        raise NotImplementedError(f"no decoder for media_type={media_type!r}")
    h = sum(payload[:64]) if payload else 0
    width = 64 + (h % 1024)
    height = 64 + ((h * 7) % 1024)
    n_frames = 1 if media_type == "image" else 1 + (h % 300)
    mean_luma = (h % 256) / 255.0
    return width, height, n_frames, mean_luma


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow-batched).

    The iterator form streams one Arrow batch at a time — a partition
    of large payloads never materializes fully in Python memory.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized over the Arrow batch (no per-row iterrows —
            # measured ~6x on the 200k-doc sf1 stub): the stub decode
            # is a pure function of the byte-sum h and media_type, so
            # compute h for the whole batch then derive columns
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            mtypes = pdf["media_type"].to_numpy()
            bad = ~np.isin(mtypes, ("image", "audio", "video"))
            if bad.any():
                # same failure a real decoder would raise, same message
                raise NotImplementedError(
                    f"no decoder for media_type={mtypes[bad.argmax()]!r}"
                )
            h = np.array(
                [
                    np.frombuffer(p[:64], dtype=np.uint8).sum(dtype=np.int64)
                    for p in payloads
                ]
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": mtypes,
                    "byte_len": np.array([len(p) for p in payloads], dtype=np.int64),
                    "width": (64 + h % 1024).astype(np.int32),
                    "height": (64 + (h * 7) % 1024).astype(np.int32),
                    "n_frames": np.where(
                        mtypes == "image", 1, 1 + h % 300
                    ).astype(np.int32),
                    "mean_luma": (h % 256) / 255.0,
                }
            )
            yield out

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan: (media_id, frame_idx) rows for videos.

    The sampling *plan* is pure Spark (sequence+explode); the actual
    frame extraction would run through :func:`decode_media`'s batch
    path with a real decoder.
    """
    return (
        decoded.filter(F.col("n_frames") > 1)
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("scale", DoubleType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def resize_plan(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize stage: target dims so the longest side is ``max_side``.

    The geometry (pure arithmetic) stays JVM-side; a real pixel
    resample would run through the same ``mapInPandas`` batch path as
    :func:`decode_media` with a real imaging library.
    """
    longest = F.greatest("width", "height")
    scale = F.when(longest > max_side, F.lit(float(max_side)) / longest).otherwise(
        F.lit(1.0)
    )
    return decoded.select(
        "media_id",
        "media_type",
        F.ceil(F.col("width") * scale).cast("int").alias("width"),
        F.ceil(F.col("height") * scale).cast("int").alias("height"),
        F.round(scale, 6).alias("scale"),
    )


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Feature-extract stage via ``mapInPandas``: payload → fixed-dim
    embedding.

    STUB features — an L1-normalized 8-bucket byte histogram (a real
    deployment swaps in a vision/audio encoder; the Arrow batch shape,
    schema, and array<double> output column are what downstream
    similarity search consumes unchanged).
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def hist_of(p) -> list[float]:
            # vectorized per payload: bincount over byte%DIM (no
            # per-byte Python loop); identical values to the naive form
            b = np.frombuffer(bytes(p) if p is not None else b"", dtype=np.uint8)
            hist = np.bincount(b[:4096] % FEATURE_DIM, minlength=FEATURE_DIM)
            total = int(hist.sum()) or 1
            return [float(v) / total for v in hist]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "embedding": [hist_of(p) for p in pdf[payload_col]],
                }
            )

    return df.mapInPandas(feats, FEATURES_SCHEMA)


def phash64(payload_col: str = "payload") -> Column:
    """64-bit perceptual-hash column for image near-dup detection.

    STAND-IN: a real pHash is a DCT over the decoded, downscaled
    grayscale image (image libs absent from this container — same
    boundary as :func:`_fake_decode`); this derives the 64 bits from
    md5 of the payload bytes, so the Spark-side *plumbing* — a LONG
    fingerprint column feeding ``operators.dedup.
    hamming_neardup_pairs(bits=64, max_hamming<=10)``, Manku-banded,
    never all-pairs — is real and tested, and swapping in a true DCT
    hash changes only this expression.  JVM-side (no Python).

    Note the semantic difference from production: md5 of bytes gives
    similar *hashes* only for identical payloads, a DCT hash gives
    them for visually similar images; the downstream banding is
    identical either way.
    """
    h = F.md5(F.col(payload_col))
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return (F.shiftleft(hi, 32).bitwiseOR(lo)).alias("phash")


def phash_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup candidate pairs by perceptual-hash Hamming
    distance — the standard image-dedup pipeline stage (pHash →
    pigeonhole bands → exact Hamming verify)."""
    from .dedup import hamming_neardup_pairs

    hashed = df.select(F.col(id_col), phash64(payload_col).alias("phash"))
    return hamming_neardup_pairs(
        hashed, "phash", id_col, bits=64, max_hamming=max_hamming
    )
