"""Property tests for the NLP-curation suite (plans/suite_nlp.py) and
the TPC-H-completion suite (plans/suite_tpch.py) beyond the oracle
parity the registry parametrization already gives them: BM25 ranking
laws, Laplace-perplexity bounds, duplicate-n-gram-fraction invariants
on planted duplicates, and q15 tie semantics on a planted tie."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.functions.textfn import (
    portable_hash64,
    strict_word_shingles,
)
from mcm_problem_f_data_wrangling_spark.plans import REGISTRY

from .conftest import SF_SMOKE


def test_bm25_scores_positive_and_sorted(spark):
    rows = REGISTRY["x_bm25_topk"].spark(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    # tie-break: within equal scores, doc_id ascending
    for a, b in zip(rows, rows[1:]):
        if a["bm25"] == b["bm25"]:
            assert a["doc_id"] < b["doc_id"]
    assert all(1 <= r["n_match_terms"] <= 3 for r in rows)


def test_bigram_perplexity_laplace_bounds(spark):
    rows = REGISTRY["x_bigram_perplexity"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Laplace-smoothed probs are in (0, 1): NLL > 0, ppl = e^NLL > 1
        assert r["avg_nll"] > 0
        assert r["perplexity"] > 1
        assert math.isclose(
            r["perplexity"], math.exp(r["avg_nll"]), rel_tol=1e-3
        )
        assert r["n_bigrams"] >= 1


def test_dup_ngram_fraction_planted_duplicates(spark):
    # 2 identical 10-token docs + 1 disjoint doc: the twins' distinct
    # 8-grams all repeat cross-doc (fraction 1.0), the loner's none.
    ten = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"z{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, ten), (2, ten), (3, other)], ["doc_id", "text"]
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    strict_word_shingles("text", 8),
                    lambda s: portable_hash64(s),
                )
            )
        ).alias("h"),
    )
    cnt = grams.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    frac = {
        r["doc_id"]: (r["dup"], r["tot"])
        for r in grams.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("n_docs") > 1).cast("int")).alias("dup"),
            F.count(F.lit(1)).alias("tot"),
        )
        .collect()
    }
    assert frac[1] == (3, 3)  # 10 tokens → 3 distinct 8-grams, all dup
    assert frac[2] == (3, 3)
    assert frac[3] == (0, 3)


def test_dup_ngram_fraction_registry_bounds(spark):
    rows = REGISTRY["x_dup_ngram_fraction"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_dup"] <= r["n_grams"]
        assert math.isclose(
            r["dup_fraction"], r["n_dup"] / r["n_grams"], rel_tol=1e-12
        )


def test_q15_returns_all_max_revenue_ties(spark, tmp_path):
    # planted tie: two suppliers with identical quarter revenue
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, "1996-02-01"),
            (2, 50.0, 0.0, "1996-02-01"),
            (2, 50.0, 0.0, "1996-03-01"),
            (3, 10.0, 0.0, "1996-02-01"),
            (1, 999.0, 0.0, "1995-01-01"),  # outside the quarter
        ],
        ["l_suppkey", "l_extendedprice", "l_discount", "d"],
    ).withColumn("l_shipdate", F.col("d").cast("timestamp_ntz"))
    sup = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["s_suppkey", "s_name"]
    )
    d = str(tmp_path)
    li.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    sup.write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    rows = REGISTRY["q15_top_supplier"].spark(spark, d).collect()
    assert {(r["s_suppkey"], r["total_revenue"]) for r in rows} == {
        (1, 100.0),
        (2, 100.0),
    }


def test_q13_keeps_zero_order_customers(spark, tmp_path):
    # the left-join filter must stay in the ON clause: a customer with
    # ONLY urgent orders lands in the 0 bucket, not dropped
    c = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    o = spark.createDataFrame(
        [
            (10, 1, "1-URGENT"),
            (11, 2, "5-LOW"),
            (12, 2, "5-LOW"),
        ],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    d = str(tmp_path)
    c.write.mode("overwrite").parquet(f"{d}/customer.parquet")
    o.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    dist = {
        r["c_count"]: r["custdist"]
        for r in REGISTRY["q13_customer_distribution"].spark(spark, d).collect()
    }
    assert dist == {0: 2, 2: 1}  # custkeys 1 (urgent-only) and 3 → 0 bucket


def test_countmin_estimate_never_underestimates(spark):
    rows = REGISTRY["x_countmin_estimate"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        # the CMS one-sided error guarantee
        assert r["cms_estimate"] >= r["exact_count"] > 0
        assert r["overestimate"] == r["cms_estimate"] - r["exact_count"]


def test_source_overlap_matrix_bounds(spark):
    rows = REGISTRY["x_source_overlap_matrix"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["shared_grams"] <= min(r["total_a"], r["total_b"])
        assert 0 < r["overlap_coef"] <= 1.0


def test_hard_negatives_exclude_same_label(spark):
    rows = REGISTRY["x_sim_hard_negatives"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == 15  # 5 probes × top-3
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    label_of = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    by_probe: dict[int, list] = {}
    for r in rows:
        assert r["neighbor_label"] != label_of[r["qid"]]
        assert -1.0 <= r["cos_sim"] <= 1.0
        by_probe.setdefault(r["qid"], []).append(r["cos_sim"])
    assert len(by_probe) == 5
    for sims in by_probe.values():
        assert sims == sorted(sims, reverse=True)


def test_token_entropy_bounds(spark):
    rows = REGISTRY["x_token_entropy"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_distinct), with equality iff uniform
        assert -1e-6 <= r["entropy_bits"] <= math.log2(r["n_distinct"]) + 1e-6  # 6-dp rounding slack
        assert r["n_distinct"] <= r["n_tokens"]


def test_corpus_drift_divergence_bounds(spark):
    r = REGISTRY["x_corpus_drift_kl"].spark(spark, SF_SMOKE).collect()[0]
    # Gibbs: KL >= 0; JS bounded by ln 2; smoothing keeps all finite
    assert r["kl_pq"] >= -1e-6 and r["kl_qp"] >= -1e-6
    assert -1e-6 <= r["js_divergence"] <= math.log(2) + 1e-6
    assert r["n_vocab"] > 0


def test_drawdown_and_dedup_rate_bounds(spark):
    r = {x["flag"]: x for x in REGISTRY["w34_max_drawdown"].spark(spark, SF_SMOKE).collect()}
    assert r
    for v in r.values():
        assert -1.0 <= v["max_drawdown"] <= 0.0  # ratio to running max
    rows = REGISTRY["x_dedup_rate_by_source"].spark(spark, SF_SMOKE).collect()
    assert rows
    for x in rows:
        assert 0 <= x["n_dups"] < x["n_docs"]
        assert 0.0 <= x["dup_rate"] < 1.0


def test_synth_partsupp_dbgen_invariants(spark):
    """Synthesized partsupp (suite_tpch.synth_partsupp): 4 DISTINCT
    suppliers per part, suppkeys within the supplier key domain, and
    deterministic availqty/supplycost ranges."""
    from mcm_problem_f_data_wrangling_spark.plans.suite_tpch import synth_partsupp

    ps = synth_partsupp(spark, SF_SMOKE)
    n_part = spark.read.parquet(f"{SF_SMOKE}/part.parquet").count()
    n_supp = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet").count()
    agg = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("n_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
    )
    rows = agg.collect()
    assert len(rows) == n_part
    assert all(r["n_distinct"] == 4 and r["n_rows"] == 4 for r in rows)
    assert all(0 <= r["lo"] and r["hi"] < n_supp for r in rows)
    stats = ps.agg(
        F.min("ps_availqty").alias("q_lo"),
        F.max("ps_availqty").alias("q_hi"),
        F.min("ps_supplycost").alias("c_lo"),
        F.max("ps_supplycost").alias("c_hi"),
    ).first()
    assert 1 <= stats["q_lo"] and stats["q_hi"] <= 9999
    assert 1.0 <= stats["c_lo"] and stats["c_hi"] < 201.0
    # determinism: two independent builds agree exactly
    again = synth_partsupp(spark, SF_SMOKE)
    assert ps.exceptAll(again).isEmpty() and again.exceptAll(ps).isEmpty()


def test_dup_span_detection_planted_spans(spark, tmp_path):
    """x_dup_span_detection on planted data: two docs share a 12-token
    run (5 consecutive dup 8-grams -> ONE maximal span of 12 tokens in
    each doc); a third disjoint doc yields nothing; a shared run of
    only 9 tokens (2 grams < min_run 3) is suppressed."""
    import pandas as pd

    from mcm_problem_f_data_wrangling_spark.plans import REGISTRY

    shared12 = " ".join(f"d{i}" for i in range(12))
    shared9 = " ".join(f"s{i}" for i in range(9))
    pad_a = " ".join(f"a{i}" for i in range(8))
    pad_b = " ".join(f"b{i}" for i in range(8))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                f"{pad_a} {shared12}",            # span at pos 9..20
                f"{shared12} {pad_b}",            # span at pos 1..12
                f"{shared9} " + " ".join(f"z{i}" for i in range(12)),  # 2-gram run
                f"{shared9} {pad_a.replace('a', 'q')}",  # 2-gram run (shared w/ doc 3)
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [0] * 4,
        }
    )
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        for r in REGISTRY["x_dup_span_detection"].spark(spark, sf_dir).collect()
    )
    assert got == [(1, 9, 20, 12, 5), (2, 1, 12, 12, 5)]


def test_backtest_drift_error_laws(spark):
    """w35_backtest_drift: every fold scores a full 3-step horizon,
    errors are non-negative, and RMSE >= MAE (power-mean inequality)."""
    rows = REGISTRY["w35_backtest_drift"].spark(spark, SF_SMOKE).collect()
    assert rows and len(rows) % 6 == 0  # 6 folds per series
    for r in rows:
        assert r["n_steps"] == 3
        assert r["mae"] >= 0 and r["rmse"] >= 0
        assert r["rmse"] >= r["mae"] - 1e-9


def test_corpus_shuffle_shards_partition_laws(spark):
    """x_corpus_shuffle_shards: shards partition the corpus exactly
    (doc counts sum to |documents|), ids are in [0, 16), and the
    manifest is deterministic across runs."""
    got = REGISTRY["x_corpus_shuffle_shards"].spark(spark, SF_SMOKE)
    rows = got.collect()
    n_docs_total = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    assert all(0 <= r["shard"] < 16 for r in rows)
    again = REGISTRY["x_corpus_shuffle_shards"].spark(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_canonical_pick_keeps_longest_variant(spark, tmp_path):
    """x_dedup_canonical_pick on planted variants: three docs share a
    token SET but differ in repetition/length -> the longest survives
    (an override of naive min-id); a singleton doc is kept as-is."""
    import pandas as pd

    from mcm_problem_f_data_wrangling_spark.plans import REGISTRY

    base = "alpha beta gamma"
    pdf = pd.DataFrame(
        {
            "doc_id": [5, 6, 7, 9],
            "text": [
                base,                       # shortest, smallest id
                f"{base} beta",             # longer
                f"{base} beta gamma alpha", # longest -> canonical
                "delta epsilon",            # singleton group
            ],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
        }
    )
    pdf["n_chars"] = pdf["text"].str.len()
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet", index=False)

    [r] = REGISTRY["x_dedup_canonical_pick"].spark(spark, sf_dir).collect()
    assert (r["n_docs"], r["n_kept"], r["n_dropped"], r["n_quality_overrides"]) == (
        4, 2, 2, 1,
    )
