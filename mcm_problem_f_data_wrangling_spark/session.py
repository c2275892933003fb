"""SparkSession factory tuned for both local testing and cluster scale.

The reference runs single-process pandas (SURVEY.md §3: no physical
layer).  Here every knob is chosen for the 100 TB north star while
remaining correct on ``local[32]``:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast conversion replace the reference's
  hand-applied "small dims first" ordering
  (``bls_ces/load_CES_pandas.py:136-139``).
- Arrow on: every pandas-UDF boundary (model fitting, multimodal
  decode) moves batches, not rows.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster this is expected to be overridden (or left to AQE
  with a high initial partition number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "mcm_problem_f_data_wrangling_spark"


def default_parallelism() -> int:
    """Local core budget; honors the driver's SPARK_GRAFT_CPUS."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env and env.isdigit():
        return int(env)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.session.timeZone", "UTC")
        # pandas-parity: reference relies on silent coerce-to-NaN casts
        # (bls_ces/load_CES_pandas.py:171); ANSI would raise instead.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
