"""Python UDTF surface (functions/tablefn.py): lifecycle correctness
(eval/terminate), SQL TABLE() registration, and equivalence with the
native sessionize path on a single-user ordered stream."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def sess_udtf():
    from mcm_problem_f_data_wrangling_spark.functions.tablefn import (
        make_sessionize_udtf,
    )

    return make_sessionize_udtf(gap_seconds=600)


def test_udtf_splits_on_gap_and_flushes_tail(spark, sess_udtf):
    spark.udtf.register("sessionize_events", sess_udtf)
    # one user, ascending: two sessions split by a >600s gap; the
    # second session must come from terminate(), not eval()
    rows = spark.sql(
        """
        SELECT * FROM sessionize_events(TABLE(
          SELECT CAST(ts AS DOUBLE) AS ts
          FROM VALUES (0.0),(100.0),(500.0),(2000.0),(2100.0) AS t(ts)
        ) WITH SINGLE PARTITION ORDER BY ts)
        """
    ).collect()
    got = [(r.session_start, r.session_end, r.n_events) for r in rows]
    assert got == [(0.0, 500.0, 3), (2000.0, 2100.0, 2)]


def test_udtf_matches_native_sessionize(spark, sess_udtf):
    """Same gap rule as streaming/sessionize.py::sessionize_batch —
    session count and sizes agree for one user's ordered events."""
    import numpy as np

    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.streaming.sessionize import (
        sessionize_batch,
    )

    rng = np.random.RandomState(0)
    ts = np.cumsum(rng.exponential(scale=300.0, size=200))  # ~E[gap]=300s
    events = (
        spark.createDataFrame([("u1", float(t)) for t in ts], ["user_id", "sec"])
        .withColumn("ts", F.timestamp_seconds("sec"))
        .withColumn("value", F.lit(1.0))
    )

    native = sessionize_batch(
        events, key_col="user_id", ts_col="ts", value_col="value", gap_seconds=600
    )
    native_sizes = sorted(r["n_events"] for r in native.collect())

    spark.udtf.register("sessionize_events", sess_udtf)
    events.select("sec").createOrReplaceTempView("one_user_events")
    udtf_rows = spark.sql(
        """
        SELECT * FROM sessionize_events(TABLE(
          SELECT sec FROM one_user_events
        ) WITH SINGLE PARTITION ORDER BY sec)
        """
    ).collect()
    udtf_sizes = sorted(r.n_events for r in udtf_rows)
    assert udtf_sizes == native_sizes


def test_udtf_ignores_null_rows(spark, sess_udtf):
    spark.udtf.register("sessionize_events", sess_udtf)
    rows = spark.sql(
        """
        SELECT * FROM sessionize_events(TABLE(
          SELECT CAST(ts AS DOUBLE) AS ts
          FROM VALUES (CAST(NULL AS DOUBLE)),(10.0),(20.0) AS t(ts)
        ) WITH SINGLE PARTITION ORDER BY ts)
        """
    ).collect()
    assert [(r.session_start, r.session_end, r.n_events) for r in rows] == [
        (10.0, 20.0, 2)
    ]
