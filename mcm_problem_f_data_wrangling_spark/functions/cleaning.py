"""Cleaning/casting helpers (SURVEY.md §2.2 P4, §2.7 F7-F8).

pandas-parity notes: ``pd.to_numeric(errors="coerce")``
(``bls_ces/load_CES_pandas.py:171``, ``bls_ces/prep_CES_pandas.py:129``)
maps to a non-ANSI ``cast`` — NULL on garbage, never an exception.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def strip_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """P4: trim whitespace on join-key columns.

    Mirrors ``.astype("string").str.strip()`` at
    ``bls_ces/prep_CES_pandas.py:117-125,163``.  Stays in whole-stage
    codegen; at scale prefer trimming once at ingest so downstream
    joins see clean keys without re-evaluating trim per use.
    """
    present = [c for c in cols if c in df.columns]
    return df.withColumns({c: F.trim(F.col(c)) for c in present}) if present else df


def to_double_coerce(col: Column | str) -> Column:
    """F7: numeric coercion, NULL on bad input (pandas ``errors="coerce"``)."""
    return (F.col(col) if isinstance(col, str) else col).try_cast("double")


def to_int_coerce(col: Column | str) -> Column:
    """F8: integer cast (``astype(int)`` at ``bls_ces/prep_CES_pandas.py:128``)."""
    return (F.col(col) if isinstance(col, str) else col).try_cast("int")
