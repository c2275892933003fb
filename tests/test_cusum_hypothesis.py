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
