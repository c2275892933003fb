"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical
collapse_career pipeline re-expressed over the testdata fixtures,
SURVEY.md §7) at sf0.001.  ``queries()`` / ``oracle_sql()`` expose the
full suite from ``mcm_problem_f_data_wrangling_spark.plans`` — one
entry per implemented operator family from SURVEY.md §2 plus the
BASELINE.json extension operators.  Queries whose oracle is ``None``
(seeded Monte-Carlo, stubbed multimodal decode) intentionally get the
driver's weaker rows-only check (SURVEY.md §4 item 3).
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from mcm_problem_f_data_wrangling_spark.plans import REGISTRY
from mcm_problem_f_data_wrangling_spark.session import ship_package

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Python-UDF stages need the package importable on workers; ship it
    before the first query runs (no-op after the first call)."""

    @functools.wraps(fn)
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ship_package(spark)
    return REGISTRY["flagship_career_collapse"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: _shipped(q.spark) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
