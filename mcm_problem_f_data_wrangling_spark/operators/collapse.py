"""Per-career monthly collapse (SURVEY.md §3 entry point 2; operators
A1-A2, J4-J5, P6, P9, W10) — the reference's canonical pipeline.

``collapse_career`` (``bls_ces/prep_CES_pandas.py:69-102``): split the
extract into employment and earnings measures, group-sum employment by
month, join earnings to employment weights on (date, industry_code),
take the employment-weighted mean of earnings per month, join the two
monthly aggregates, sort by date.

Scale design:
- A2's ``groupby().apply`` weighted-mean lambda (X2) decomposes into
  ``sum(value*w)/sum(w)`` — a native partial+final hash aggregate, no
  UDAF, one shuffle on the group key (SURVEY.md §2.4 A2).
- J4 joins two already-aggregated frames keyed on
  (date, industry_code) — both tiny after aggregation; AQE converts to
  broadcast at runtime.
- The whole collapse runs for ALL careers in one plan when given a
  ``career`` column (``collapse_careers``) — one shuffle keyed on
  (career, date) replaces the reference's per-career Python loop
  (``bls_ces/prep_CES_pandas.py:171-183``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMPLOYMENT_MEASURE = "ALL EMPLOYEES, THOUSANDS"
EARNINGS_MEASURE = "AVERAGE HOURLY EARNINGS OF ALL EMPLOYEES"


def collapse_career(
    extract: DataFrame,
    employment_measure: str = EMPLOYMENT_MEASURE,
    earnings_measure: str = EARNINGS_MEASURE,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Two-metric monthly series from a tidy extract.

    Parity: ``bls_ces/prep_CES_pandas.py:69-102``.  ``extra_keys``
    (e.g. ``["career"]``) generalizes the reference's one-career-at-a-
    time loop into a single grouped plan.
    Output: ``(extra_keys..., date, employment_thousands,
    avg_hourly_earnings)`` sorted by keys+date.
    """
    keys = list(extra_keys or [])
    gdate = keys + ["date"]

    emp = extract.filter(F.col("datatype_text") == employment_measure)  # P6 split
    earn = extract.filter(F.col("datatype_text") == earnings_measure)

    # A1: employment group-sum by month (prep_CES_pandas.py:74-77)
    emp_m = emp.groupBy(*gdate).agg(
        F.sum("value").alias("employment_thousands")
    )

    # J4: earnings ⨝ per-(date, industry) employment weights
    # (prep_CES_pandas.py:81-87 — rename value→emp_weight_thousands)
    weights = emp.select(
        *gdate, "industry_code", F.col("value").alias("emp_weight_thousands")
    )
    earn_w = earn.join(weights, gdate + ["industry_code"], "left")

    # A2: employment-weighted mean as sum/sum — native partial+final
    # aggregate replacing the groupby.apply lambda
    # (prep_CES_pandas.py:88-94).
    earn_m = earn_w.groupBy(*gdate).agg(
        (
            F.sum(F.col("value") * F.col("emp_weight_thousands"))
            / F.sum("emp_weight_thousands")
        ).alias("avg_hourly_earnings")
    )

    # J5 + W10: join the two monthly aggregates, order by keys+date
    # (prep_CES_pandas.py:97-98)
    return emp_m.join(earn_m, gdate, "left").orderBy(*gdate)
