"""Property fuzz: windowed_range_join == naive O(n²) pairing.

The binning trick (explode left into 2 bins, equi-join, exact filter)
must return EXACTLY the pairs `0 <= rts - lts <= W` per key for any
data — boundary timestamps, bin-edge alignment, duplicate times, empty
sides.  The reference answer is computed in pure Python.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mcm_problem_f_data_wrangling_spark.operators.range_join import (
    windowed_range_join,
)

BASE = 1_700_000_000


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


# coarse second grid so boundary/bin-edge collisions actually occur
sec = st.integers(min_value=0, max_value=300)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(st.integers(0, 2), sec), min_size=0, max_size=20),
    right=st.lists(st.tuples(st.integers(0, 2), sec), min_size=0, max_size=20),
    window=st.sampled_from([1.0, 7.0, 60.0, 120.0]),
)
def test_range_join_matches_naive(sparkref, left, right, window):
    spark = sparkref
    lrows = [(i, f"k{k}", float(BASE + t)) for i, (k, t) in enumerate(left)]
    rrows = [(100 + i, f"k{k}", float(BASE + t)) for i, (k, t) in enumerate(right)]
    expected = {
        (lid, rid)
        for lid, lk, lt in lrows
        for rid, rk, rt in rrows
        if lk == rk and 0.0 <= rt - lt <= window
    }
    ldf = spark.createDataFrame(
        lrows or [(None, None, None)], "lid long, k string, lsec double"
    ).filter("lid IS NOT NULL").selectExpr("lid", "k", "timestamp_seconds(lsec) AS lts")
    rdf = spark.createDataFrame(
        rrows or [(None, None, None)], "rid long, k string, rsec double"
    ).filter("rid IS NOT NULL").selectExpr("rid", "k", "timestamp_seconds(rsec) AS rts")
    got = {
        (r["lid"], r["rid"])
        for r in windowed_range_join(ldf, rdf, ["k"], "lts", "rts", window).collect()
    }
    assert got == expected
