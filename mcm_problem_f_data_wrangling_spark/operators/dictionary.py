"""Series-dictionary build + metadata search (SURVEY.md §2.2 P1, §2.3
J1-J2, §2.2 P10-P11).

The reference builds a denormalized ``series_dict`` by two left merges
of tiny dimensions (``bls_ces/load_CES_pandas.py:136-139``,
``bls_ces/prep_CES_pandas.py:132-136``).  At 100 TB the fact table is
huge but these dims stay O(10^4) rows — so both joins are explicit
``broadcast`` hash joins: zero shuffle, dict shipped once per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.predicates import ci_contains


def build_series_dictionary(
    series: DataFrame,
    industry: DataFrame,
    datatype: DataFrame,
    include_naics: bool = True,
) -> DataFrame:
    """series ⨝ industry ⨝ datatype → one row per series_id.

    Mirrors ``build_dictionary`` (``bls_ces/load_CES_pandas.py:76-141``)
    and the prep variant carrying ``naics_code``
    (``bls_ces/prep_CES_pandas.py:132-136``).  Projection-first (P1)
    keeps the broadcast payload minimal; Catalyst would prune anyway,
    but a small explicit select documents the contract.
    """
    s = series.select(
        F.col("series_id"),
        F.col("industry_code"),
        F.col("data_type_code").alias("datatype_code"),
        F.col("seasonal"),
    )
    ind_cols = ["industry_code", "industry_name"] + (
        ["naics_code"] if include_naics and "naics_code" in industry.columns else []
    )
    i = industry.select(*ind_cols)
    d = datatype.select(
        F.col("data_type_code").alias("datatype_code"),
        F.col("data_type_text").alias("datatype_text"),
    )
    return s.join(broadcast(i), "industry_code", "left").join(
        broadcast(d), "datatype_code", "left"
    )


def search_industries(industry_like: DataFrame, keyword: str, name_col: str = "industry_name", code_col: str = "industry_code", limit: int = 50) -> DataFrame:
    """P10+P11+W11: case-insensitive industry search, distinct, top-n.

    Mirrors ``show_industries`` (``bls_ces/load_CES_pandas.py:216-219``)
    and the prep debug searches (``bls_ces/prep_CES_pandas.py:139-149``).
    """
    return (
        industry_like.filter(ci_contains(name_col, keyword))
        .select(code_col, name_col)
        .dropDuplicates([code_col, name_col])
        .orderBy(code_col)
        .limit(limit)
    )
