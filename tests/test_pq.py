"""Product quantization: recall vs brute force, determinism, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.operators.similarity import (
    brute_force_topk,
    encode_pq,
    pq_adc_topk,
    pq_search_rerank,
    query_vector_of,
    train_pq,
)

SF = "/root/testdata/sf0.01"
QIDS = (0, 17, 101)


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq(emb, m=16, k=32, iters=3)


@pytest.fixture(scope="module")
def codes(emb, codebooks):
    c = encode_pq(emb, codebooks).select("vec_id", "pq_code")
    c.cache().count()
    return c


def test_codebook_shape(codebooks):
    assert len(codebooks) == 16
    assert all(len(cb) == 32 for cb in codebooks)
    assert all(len(c) == 4 for cb in codebooks for c in cb)


def test_pq_adc_recall_at_10(emb, codebooks, codes):
    hits = 0
    for qid in QIDS:
        q = query_vector_of(emb, qid)
        truth = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        got = {r["vec_id"] for r in pq_adc_topk(codes, codebooks, q, k=10).collect()}
        hits += len(truth & got)
    # 16x-compressed codes alone find a usable share of the true top-10
    assert hits / (10 * len(QIDS)) >= 0.4


def test_pq_rerank_recall_at_10(emb, codebooks, codes):
    hits = 0
    for qid in QIDS:
        q = query_vector_of(emb, qid)
        truth = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        got = {
            r["vec_id"]
            for r in pq_search_rerank(emb, codes, codebooks, q, k=10, shortlist=50).collect()
        }
        hits += len(truth & got)
    # shortlist-50 exact rerank recovers nearly everything
    assert hits / (10 * len(QIDS)) >= 0.8


def test_pq_self_is_nearest(emb, codebooks, codes):
    q = query_vector_of(emb, 42)
    top = pq_adc_topk(codes, codebooks, q, k=3).collect()
    assert top[0]["vec_id"] == 42


def test_encode_deterministic_under_repartition(emb, codebooks):
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in encode_pq(emb, codebooks).select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in encode_pq(emb.repartition(7), codebooks).select("vec_id", "pq_code").collect()
    }
    assert a == b


def test_adc_search_is_shuffle_free(emb, codebooks, codes):
    q = query_vector_of(emb, 0)
    plan = (
        pq_adc_topk(codes, codebooks, q, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # pure map + TakeOrderedAndProject: no exchange over the corpus
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
