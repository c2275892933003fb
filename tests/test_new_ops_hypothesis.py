"""Property-based fuzz for the newest operators: linear interpolation
vs pandas, and chunking coverage invariants vs a pure-Python reference.

Same batching trick as test_rolling_hypothesis: each example packs many
generated series/documents into ONE DataFrame so the Spark round trip
is paid per example, not per series.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mcm_problem_f_data_wrangling_spark.operators.chunking import chunk_documents
from mcm_problem_f_data_wrangling_spark.operators.grid import interpolate_linear

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False,
    allow_subnormal=False,
)
# series of (present?, value); x positions are the list indices (unique,
# ordered), some y values replaced by NULL
series_strategy = st.lists(
    st.one_of(finite, st.none()), min_size=2, max_size=25
)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batch=st.lists(series_strategy, min_size=1, max_size=6))
def test_interpolate_matches_pandas_fuzz(sparkref, batch):
    spark = sparkref
    rows = [
        (f"s{si}", float(t), v)
        for si, series in enumerate(batch)
        for t, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {
        (r["k"], r["x"]): r["y"]
        for r in interpolate_linear(df, ["k"], "x", "y").collect()
    }
    for si, series in enumerate(batch):
        exp = (
            pd.Series(series, index=[float(t) for t in range(len(series))], dtype="float64")
            .interpolate(method="index", limit_area="inside")
        )
        for x, v in exp.items():
            g = got[(f"s{si}", x)]
            if pd.isna(v):
                assert g is None
            else:
                assert g == pytest.approx(v, rel=1e-12, abs=1e-9)


words_strategy = st.lists(
    st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=0, max_size=40
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(words_strategy, min_size=1, max_size=5),
    chunk=st.integers(min_value=1, max_value=12),
    stride=st.integers(min_value=1, max_value=12),
)
def test_chunking_invariants_fuzz(sparkref, docs, chunk, stride):
    spark = sparkref
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    rows = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(docs):
        if not ws:
            assert i not in by_doc
            continue
        got = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        starts = [r["start_token"] for r in got]
        assert starts == list(range(0, len(ws), stride))
        for r in got:
            s = r["start_token"]
            ref = ws[s : s + chunk]
            assert r["chunk_text"] == " ".join(ref)
            assert r["n_tokens"] == len(ref)
        if stride <= chunk:
            # full coverage: every token index inside some window
            covered = set()
            for r in got:
                covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
            assert covered == set(range(len(ws)))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hashes=st.lists(
        st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
        min_size=2,
        max_size=24,
    ),
    max_hamming=st.integers(min_value=0, max_value=7),
)
def test_hamming_neardup_exact_vs_bruteforce(sparkref, hashes, max_hamming):
    """Pigeonhole banding is EXACT: for random (incl. adversarially
    close — hypothesis shrinks toward duplicates) 64-bit values and
    any threshold, the banded pair set equals brute force."""
    from itertools import combinations

    from mcm_problem_f_data_wrangling_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    df = sparkref.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id INT, h LONG"
    )
    got = {
        (r["doc_id_1"], r["doc_id_2"], r["hamming"])
        for r in hamming_neardup_pairs(
            df, "h", "doc_id", bits=64, max_hamming=max_hamming
        ).collect()
    }
    want = {
        (i, j, bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1"))
        for i, j in combinations(range(len(hashes)), 2)
        if bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1") <= max_hamming
    }
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=12,
    ),
    seg_tokens=st.integers(min_value=1, max_value=4),
    max_df=st.integers(min_value=1, max_value=4),
)
def test_boilerplate_removal_vs_python_reference(sparkref, docs, seg_tokens, max_df):
    """Tiny-vocab corpora force heavy segment collisions; the Spark
    result must match a direct Python computation of the same spec
    (segment df over DISTINCT docs, order-preserving removal)."""
    from collections import defaultdict

    from mcm_problem_f_data_wrangling_spark.operators.quality import (
        boilerplate_removal,
    )

    def segs_of(text):
        toks = [t for t in text.split() if t]
        return [
            " ".join(toks[i * seg_tokens : (i + 1) * seg_tokens])
            for i in range((len(toks) + seg_tokens - 1) // seg_tokens)
        ]

    seg_docs = defaultdict(set)
    for i, d in enumerate(docs):
        for s in segs_of(d):
            seg_docs[s].add(i)
    boiler = {s for s, ids in seg_docs.items() if len(ids) > max_df}
    want = {}
    for i, d in enumerate(docs):
        segs = segs_of(d)
        kept = [s for s in segs if s not in boiler]
        want[i] = (len(segs), len(segs) - len(kept), " ".join(kept))

    df = sparkref.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id INT, text STRING"
    )
    out = boilerplate_removal(df, seg_tokens=seg_tokens, max_df=max_df).collect()
    got = {r["doc_id"]: (r["n_segments"], r["n_boiler"], r["cleaned_text"]) for r in out}
    assert got == want
