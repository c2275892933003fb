"""Date/calendar helpers (SURVEY.md §2.7 F2-F6, §2.5 W13).

The reference synthesizes month-grain dates from (year, period) string
columns (``bls_ces/load_CES_pandas.py:149-154``,
``bls_ces/prep_CES_pandas.py:52-54``) and normalizes series to
month-start/month-end with pandas ``Period('M')`` (``EDA.ipynb cells
23, 25, 27``).  Spark has no PeriodType (SURVEY.md §1.2): month grain
is modeled as DateType truncated with ``trunc``/``last_day``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def make_month_date(year: Column | str, month: Column | str) -> Column:
    """First-of-month date from numeric year/month — no string round-trip.

    Scale-preferred form of the reference's
    ``year + "-" + month.zfill(2) + "-01"`` concat
    (``bls_ces/load_CES_pandas.py:150-153``): ``make_date`` avoids
    string allocation per row.
    """
    return F.make_date(_c(year).cast("int"), _c(month).cast("int"), F.lit(1))


def synthesize_date(year: Column | str, period: Column | str) -> Column:
    """F2-F5: date from CES (year, 'Mxx' period) string pair.

    String-faithful variant: strip the leading 'M'
    (``str.replace("M","")``, ``load_CES_pandas.py:149``), zero-pad
    (F3), concat (F4), ``to_date`` with coerce-to-NULL (F5).  Non-month
    garbage (e.g. 'M13' if unfiltered) still parses; callers apply the
    P5 monthly filter first, same as the reference.
    """
    month = F.regexp_replace(_c(period), "M", "")
    return F.to_date(
        F.concat_ws("-", _c(year), F.lpad(month, 2, "0"), F.lit("01")),
        "yyyy-MM-dd",
    )


def month_start(col: Column | str) -> Column:
    """F6: ``to_period('M').to_timestamp(how='start')`` ≡ trunc-to-month."""
    return F.trunc(_c(col), "month")


def month_end(col: Column | str) -> Column:
    """F6: ``to_period('M').to_timestamp(how='M')`` ≡ last_day."""
    return F.last_day(_c(col))


def future_month_index(last_month: Column | str, steps: int) -> Column:
    """W13: array of the next ``steps`` month-start dates after ``last_month``.

    Mirrors ``future_month_index`` (``EDA.ipynb cells 27-28``:
    ``pd.date_range(next_month, periods=H, freq='ME')`` — month grain).
    Pair with ``posexplode`` to get (step, month) rows.
    """
    base = F.trunc(_c(last_month), "month")
    return F.sequence(
        F.add_months(base, 1),
        F.add_months(base, steps),
        F.expr("interval 1 month"),
    )
