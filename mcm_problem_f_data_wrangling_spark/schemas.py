"""Fixed StructType schemas.

The reference discovers columns dynamically at runtime (``find_col``,
``bls_ces/load_CES_pandas.py:96-110``) because BLS headers drift.  The
Spark-first design (SURVEY.md §1.3) pins explicit schemas — letting the
scan skip inference and letting Catalyst prune columns — and keeps a
small normalization layer (``sources.readers.normalize_columns``) for
the alias-resolution role ``find_col`` played.

Two families:
- CES-shaped fixtures (FIXTURES.md §1-7): the reference's own tables.
- Driver testdata (TESTDATA.md): TPC-H-ish parquet; schemas recorded
  here for documentation/validation (parquet is self-describing).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- CES-shaped fixtures (FIXTURES.md; mirror bls_ces/load_CES_pandas.py:21-27) ---

# fact table: one row per (series_id, year, period); all-string on load
# exactly like the reference (load_CES_pandas.py:63 dtype="string").
CES_DATA = _s(
    ("series_id", StringType()),
    ("year", StringType()),
    ("period", StringType()),
    ("value", StringType()),
)

# bridge dimension series_id -> (industry_code, data_type_code, seasonal)
CES_SERIES = _s(
    ("series_id", StringType()),
    ("industry_code", StringType()),
    ("data_type_code", StringType()),
    ("seasonal", StringType()),
)

CES_INDUSTRY = _s(
    ("industry_code", StringType()),
    ("naics_code", StringType()),
    ("industry_name", StringType()),
)

CES_DATATYPE = _s(
    ("data_type_code", StringType()),
    ("data_type_text", StringType()),
)

# collapsed per-career monthly series (prep_CES_pandas.py:69-102 output)
CAREER_MONTHLY = _s(
    ("career", StringType()),
    ("date", DateType()),
    ("employment_thousands", DoubleType()),
    ("avg_hourly_earnings", DoubleType()),
)

# exogenous AI-intensity series (EDA.ipynb cell 23)
AI_EXOG_MONTHLY = _s(
    ("month", DateType()),
    ("ai_share_monthly", DoubleType()),
    ("ai_share_smoothed", DoubleType()),
)

# tidy 10-column extract (bls_ces/out/*_proxy_monthly.csv:1)
PROXY_EXTRACT = _s(
    ("date", DateType()),
    ("year", IntegerType()),
    ("period", StringType()),
    ("series_id", StringType()),
    ("seasonal", StringType()),
    ("industry_code", StringType()),
    ("industry_name", StringType()),
    ("datatype_code", StringType()),
    ("datatype_text", StringType()),
    ("value", DoubleType()),
)


# --- driver testdata (TESTDATA.md) -----------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
