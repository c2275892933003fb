"""Predicate builders (SURVEY.md §2.2 P5-P10).

All return Column expressions that stay JVM-side (no UDFs) so Catalyst
can push them into scans and reorder them around joins.  NA-safety
follows the reference's pandas idioms: ``isin(...).fillna(False)`` and
``str.startswith(na=False)`` become explicit ``coalesce(pred, false)``
(SURVEY.md §7 hard parts — pandas NaN vs SQL 3-valued logic).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

MONTHLY_PERIOD_RE = r"^M(0[1-9]|1[0-2])$"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_monthly_period(col: Column | str = "period") -> Column:
    """P5: keep M01-M12, drop M13 annual-average rows.

    Mirrors ``period.str.match(r"^M(0[1-9]|1[0-2])$")`` at
    ``bls_ces/load_CES_pandas.py:168`` / ``prep_CES_pandas.py:155``.
    """
    return _c(col).rlike(MONTHLY_PERIOD_RE)


def code_matches(col: Column | str, codes: list[str]) -> Column:
    """P8: exact-OR-prefix code predicate, NaN treated as "".

    Mirrors ``code_matches`` at ``bls_ces/load_CES_pandas.py:237-241``
    (``fillna("")`` then ``isin | startswith-any``).  Expressed as a
    native OR-chain instead of the reference's row-wise ``apply``
    lambda (X1) — stays in codegen, pushable into the scan.
    """
    c = F.coalesce(_c(col), F.lit(""))
    pred = c.isin(list(codes))
    for code in codes:
        pred = pred | c.startswith(code)
    return pred


def naics_mask(
    col: Column | str,
    exact: list[str] | None = None,
    prefixes: list[str] | None = None,
) -> Column:
    """P9: NAICS mask — strip, exact-IN (NA→False), prefix-any (NA→False).

    Mirrors ``naics_mask`` at ``bls_ces/prep_CES_pandas.py:57-66``:
    ``s.str.strip(); s.isin(exact).fillna(False) |
    s.str.startswith(tuple(prefixes), na=False)``.
    """
    s = F.trim(_c(col))
    parts: list[Column] = []
    if exact:
        parts.append(F.coalesce(s.isin(list(exact)), F.lit(False)))
    if prefixes:
        pref = reduce(lambda a, b: a | b, [s.startswith(p) for p in prefixes])
        parts.append(F.coalesce(pref, F.lit(False)))
    if not parts:
        return F.lit(False)
    return reduce(lambda a, b: a | b, parts)


def ci_contains(col: Column | str, keyword: str) -> Column:
    """P10: case-insensitive substring search, NA→False.

    Mirrors ``str.contains(kw, case=False, na=False)`` at
    ``bls_ces/load_CES_pandas.py:216-219`` /
    ``prep_CES_pandas.py:139-149``.
    """
    return F.coalesce(F.lower(_c(col)).contains(keyword.lower()), F.lit(False))
