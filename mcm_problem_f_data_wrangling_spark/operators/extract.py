"""Proxy-dataset extraction (SURVEY.md §3 entry point 1; operators
P5-P8, J3, F2-F7, W10).

The reference's ``extract_proxy_dataset``
(``bls_ces/load_CES_pandas.py:157-200``): monthly regex filter →
numeric cast → fact⨝dict → industry predicate → measure IN-filter →
optional seasonal filter → date synthesis → 10-column projection →
3-key sort.

Scale notes: filters are applied to the fact side BEFORE the join so
Catalyst pushes them into the parquet scan; the dictionary side is
broadcast (J3 is the workhorse big⨝small join).  The final global sort
is kept for parity with the reference's CSV output; at 100 TB callers
should pass ``sort=False`` and use ``sortWithinPartitions`` downstream
(SURVEY.md §7 hard parts — global sort cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.cleaning import to_double_coerce, to_int_coerce
from ..functions.datefn import synthesize_date
from ..functions.predicates import code_matches, is_monthly_period

OUTPUT_COLUMNS = [
    "date",
    "year",
    "period",
    "series_id",
    "seasonal",
    "industry_code",
    "industry_name",
    "datatype_code",
    "datatype_text",
    "value",
]


def extract_proxy_dataset(
    data: DataFrame,
    series_dict: DataFrame,
    industry_codes: list[str],
    measures: list[str],
    seasonal: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """Filtered tidy extract with synthesized month date.

    Parity: ``bls_ces/load_CES_pandas.py:157-200``.  Output schema is
    the 10-column header of ``bls_ces/out/mechanic_proxy_monthly.csv:1``.
    """
    fact = (
        data.filter(is_monthly_period("period"))  # P5 — pushed to scan
        .withColumn("value", to_double_coerce("value"))  # F7 coerce→NULL
        .withColumn("year", to_int_coerce("year"))
    )
    joined = fact.join(broadcast(series_dict), "series_id", "left")  # J3
    out = (
        joined.filter(code_matches("industry_code", industry_codes))  # P8
        .filter(F.col("datatype_text").isin(measures))  # P6
    )
    if seasonal is not None:  # P7 — optional equality filter
        out = out.filter(F.col("seasonal") == F.lit(seasonal))
    out = out.withColumn("date", synthesize_date("year", "period"))  # F2-F5
    out = out.select(*OUTPUT_COLUMNS)
    if sort:  # W10 — parity only; see module docstring for the scale path
        out = out.orderBy("datatype_text", "industry_code", "date")
    return out
