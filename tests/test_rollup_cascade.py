"""Rollup cascade: cascaded grains must equal direct aggregation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.rollup_cascade import rollup_cascade


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (dt.datetime(2024, 1, 1 + d, h, m), "t%d" % (i % 3), float(i) / 7)
        for i, (d, h, m) in enumerate(
            (d, h, m) for d in range(10) for h in (0, 5, 23) for m in (0, 17)
        )
    ]
    return spark.createDataFrame(rows, "ts timestamp, event_type string, value double")


def test_cascade_matches_direct_rollup_per_grain(spark, events):
    out = rollup_cascade(events, grains=("hour", "day", "week"))
    for grain in ("hour", "day", "week"):
        got = {
            (r["bucket"], r["event_type"]): (r["n"], round(r["total"], 6))
            for r in out.filter(F.col("grain") == grain).collect()
        }
        direct = {
            (r["bucket"], r["event_type"]): (r["n"], round(r["total"], 6))
            for r in events.groupBy(
                F.date_trunc(grain, "ts").alias("bucket"), "event_type"
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total"),
            )
            .collect()
        }
        assert got == direct, grain


def test_cascade_rejects_misordered_grains(spark, events):
    with pytest.raises(ValueError):
        rollup_cascade(events, grains=("day", "hour"))
    with pytest.raises(ValueError):
        rollup_cascade(events, grains=("day", "day"))


def test_cascade_counts_are_conserved(spark, events):
    out = rollup_cascade(events, grains=("hour", "day"))
    totals = {
        r["grain"]: r["s"]
        for r in out.groupBy("grain").agg(F.sum("n").alias("s")).collect()
    }
    assert totals["hour"] == totals["day"] == events.count()
