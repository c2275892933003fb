"""Property-based check of the CUSUM closed form (streaming/drift.py):
S⁺ = C − min(0, running min C) and S⁻ = C − max(0, running max C) must
equal the textbook max(0, S+d) / min(0, S+d) recursions on arbitrary
deviation series.  Hypothesis drives many series through ONE Spark
pass per example (batched keys), compared element-wise against a pure
Python reference."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.streaming.drift import cusum_batch

finite = st.floats(
    min_value=-1e3, max_value=1e3, allow_nan=False, allow_infinity=False
)
series = st.lists(finite, min_size=1, max_size=40)


def _reference(ds):
    sp, sm, out = 0.0, 0.0, []
    for d in ds:
        sp = max(0.0, sp + d)
        sm = min(0.0, sm + d)
        out.append((sp, sm))
    return out


@pytest.mark.usefixtures("spark")
@given(data=st.lists(series, min_size=1, max_size=6))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cusum_closed_form_matches_recursion(spark, data):
    rows = [
        (k, i, float(d)) for k, ds in enumerate(data) for i, d in enumerate(ds)
    ]
    df = spark.createDataFrame(rows, ["key", "pos", "d"])
    got = {
        (r["key"], r["pos"]): (r["s_plus"], r["s_minus"])
        for r in cusum_batch(df, "key", ["pos"], F.col("d"), h=1.0).collect()
    }
    for k, ds in enumerate(data):
        for i, (sp, sm) in enumerate(_reference(ds)):
            gsp, gsm = got[(k, i)]
            assert math.isclose(gsp, sp, rel_tol=1e-9, abs_tol=1e-9)
            assert math.isclose(gsm, sm, rel_tol=1e-9, abs_tol=1e-9)


def test_changepoint_recovers_planted_mean_shift(spark):
    """A clean level shift must be located exactly: 30 values at 10
    then 20 values at 50 → cp_pos 30; a no-shift constant series
    still emits its argmax row (stat tiny), and a 1-row key emits
    nothing (no interior split)."""
    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.streaming.drift import (
        changepoint_mean_shift,
    )

    rows = [("a", i, 10 if i < 30 else 50) for i in range(50)]
    rows += [("b", i, 7) for i in range(20)]
    rows += [("c", 0, 99)]
    df = spark.createDataFrame(rows, "key string, pos int, v int")
    got = {
        r.key: r
        for r in changepoint_mean_shift(
            df, "key", ["pos"], F.col("v").cast("long")
        ).collect()
    }
    a = got["a"]
    assert (a.cp_pos, a.n_rows) == (30, 50)
    assert (a.pre_sum, a.post_sum) == (300, 1000)
    # |n*C_t - t*total| at t=30: |50*300 - 30*1300| = 24000
    assert a.stat == 24000
    b = got["b"]
    assert b.stat == 0 and b.cp_pos == 1  # ties -> smallest position
    assert "c" not in got


def test_changepoint_matches_bruteforce(spark):
    """Exhaustive argmax over a pseudo-random series agrees with the
    window implementation, including the smallest-t tie-break."""
    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.streaming.drift import (
        changepoint_mean_shift,
    )

    vals = [((17 * i * i + 5 * i) % 23) - 11 for i in range(40)]
    n = len(vals)
    c, cum = 0, []
    for v in vals:
        c += v
        cum.append(c)
    best = max(
        (abs(n * cum[t - 1] - t * cum[-1]), -t) for t in range(1, n)
    )
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, pos int, v int"
    )
    r = changepoint_mean_shift(df, "key", ["pos"], F.col("v").cast("long")).collect()[0]
    assert (r.stat, -r.cp_pos) == best
    assert r.pre_sum == cum[r.cp_pos - 1] and r.post_sum == cum[-1] - cum[r.cp_pos - 1]
