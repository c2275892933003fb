"""Shared plumbing for the query suite (``queries()`` / ``oracle_sql()``).

Cross-engine determinism contract
---------------------------------
The driver hash-compares Spark results against DuckDB oracles, so
every query here is engineered for bit-stable values across engines:

- **Money/quantity sums are decimal-exact.**  Doubles are cast to
  ``DECIMAL(18,6)`` *before* summing (per-value rounding is
  deterministic; decimal addition is associative), summed exactly,
  then cast back to double.  This removes FP-summation-order
  divergence entirely — Spark's partial/final aggregate order and
  DuckDB's need not match.
- **Division happens in double, after exact sums** — one IEEE op on
  identical inputs is identical everywhere.
- **Frame aggregates that can't be decimalized** (stddev, corr,
  median interpolation, percentile) are rounded to a precision
  several orders above their worst-case cross-engine error.
- **Counts are BIGINT on both sides** (DuckDB ``SUM(int)`` is HUGEINT,
  ``len()`` is BIGINT; Spark ``count`` is long — everything is cast).
- Column names are aliased identically in both dialects (the driver
  sorts columns by name before hashing).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    """One driver-checkable query: Spark plan + optional DuckDB oracle."""

    name: str
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    headline: bool = False
    tags: tuple[str, ...] = field(default=())


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # driver testdata stores events.ts as TIMESTAMP(NANOS)
        from ..sources.readers import read_nanos_timestamp_parquet

        return read_nanos_timestamp_parquet(spark, path)
    return spark.read.parquet(path)


def spread(df: DataFrame, min_rows: int = 0) -> DataFrame:
    """Re-export of :func:`operators.skew.spread` (small-scan
    parallelization guard) for query-level use — see that docstring."""
    from ..operators.skew import spread as _spread

    return _spread(df, min_rows)


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Decimal-exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def DSUM(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def month_of(ts_col: str) -> Column:
    """Month-start DATE from a timestamp column (F6 month grain)."""
    return F.trunc(F.col(ts_col).cast("date"), "month")


def MONTH_OF(expr: str) -> str:
    return f"CAST(date_trunc('month', {expr}) AS DATE)"


def monthly_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared monthly series: decimal-exact revenue/qty per
    (l_returnflag, month) — the engine's ``career_monthly`` analogue
    (FIXTURES.md §5 role mapping: lineitem plays the CES fact)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_returnflag").alias("flag"),
        month_of("l_shipdate").alias("month"),
    ).agg(
        dsum("l_extendedprice").alias("revenue"),
        dsum("l_quantity").alias("qty"),
    )


MONTHLY_CTE = f"""
monthly AS (
  SELECT l_returnflag AS flag,
         {MONTH_OF('l_shipdate')} AS month,
         {DSUM('l_extendedprice')} AS revenue,
         {DSUM('l_quantity')} AS qty
  FROM lineitem
  GROUP BY 1, 2
)
""".strip()
