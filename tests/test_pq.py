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


# ---------------------------------------------------------------------------
# IVF-PQ (cells prune + residual codes compress)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq(emb):
    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_build

    codes, cb, cents = ivfpq_build(emb, k_cells=10, m=8, k_codes=16, iters=2)
    codes.cache().count()
    return codes, cb, cents


def test_ivfpq_rerank_recall_at_10(emb, ivfpq):
    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_topk

    codes, cb, cents = ivfpq
    hits = 0
    for qid in QIDS:
        q = query_vector_of(emb, qid)
        truth = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        got = {
            r["vec_id"]
            for r in ivfpq_topk(emb, codes, cb, cents, q, k=10, n_probe=2).collect()
        }
        hits += len(truth & got)
    # residual codes over 2/10 probed cells: well above the flat-PQ floor
    assert hits / (10 * len(QIDS)) >= 0.4


def test_ivfpq_encode_is_incremental_safe(emb, ivfpq):
    """Frozen-codebook encode is row-local: encoding a delta shard
    alone yields byte-identical codes to re-encoding those rows inside
    the full corpus — the law that makes append-only index maintenance
    (ivfpq_encode + partitionBy-append) sound."""
    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_encode

    _, cb, cents = ivfpq
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    alone = {
        r["vec_id"]: (r["cell"], list(r["pq_code"]))
        for r in ivfpq_encode(delta, cb, cents).collect()
    }
    within = {
        r["vec_id"]: (r["cell"], list(r["pq_code"]))
        for r in ivfpq_encode(emb, cb, cents).collect()
        if r["vec_id"] % 5 == 0
    }
    assert alone == within and alone


def test_ivfpq_encode_appends_to_partitioned_layout(emb, ivfpq, tmp_path):
    """Delta codes written under the existing partitionBy(cell) layout
    are immediately visible to a cell-pruned scan, and old partitions'
    files are untouched."""
    import os

    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_encode

    codes, cb, cents = ivfpq
    out = str(tmp_path / "codes")
    base = codes.filter(F.col("vec_id") % 5 != 0)
    base.repartition(1).write.partitionBy("cell").parquet(out)
    before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    delta = ivfpq_encode(emb.filter(F.col("vec_id") % 5 == 0), cb, cents)
    delta.repartition(1).write.partitionBy("cell").mode("append").parquet(out)
    after = {
        os.path.join(r, f)
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    assert before < after  # strictly appended
    spark = emb.sparkSession
    got = spark.read.parquet(out)
    assert got.count() == codes.count()
    # a cell-pruned read sees both base and delta rows of that cell
    one_cell = got.select("cell").first()["cell"]
    pruned = spark.read.parquet(out).filter(F.col("cell") == one_cell)
    want = {r["vec_id"] for r in codes.filter(F.col("cell") == one_cell).collect()}
    assert {r["vec_id"] for r in pruned.collect()} == want


def test_ivfpq_self_found_when_own_cell_probed(emb, ivfpq):
    """A vector queried with its own embedding is recovered as the top
    hit whenever enough cells are probed to include its own (n_probe =
    k_cells probes everything, so this is assignment-independent)."""
    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_topk

    codes, cb, cents = ivfpq
    q = query_vector_of(emb, 42)
    top = ivfpq_topk(emb, codes, cb, cents, q, k=3, n_probe=10).collect()
    assert top[0]["vec_id"] == 42


def test_ivfpq_codes_deterministic_given_index(emb, ivfpq):
    """Given trained (centroids, codebooks), residual encoding is a
    pure map — identical codes under repartitioning."""
    from mcm_problem_f_data_wrangling_spark.operators.similarity import (
        assign_cells,
        encode_pq,
    )
    from pyspark.sql import functions as F

    _, cb, cents = ivfpq
    cent_arr = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])

    def codes_of(df):
        resid = assign_cells(df, cents).withColumn(
            "_resid",
            F.zip_with(
                F.col("embedding"),
                F.element_at(cent_arr, F.col("cell") + 1),
                lambda a, b: a.cast("double") - b,
            ),
        )
        return {
            r["vec_id"]: (r["cell"], list(r["pq_code"]))
            for r in encode_pq(resid, cb, vec_col="_resid")
            .select("vec_id", "cell", "pq_code")
            .collect()
        }

    assert codes_of(emb) == codes_of(emb.repartition(7))


def test_ivfpq_search_reads_only_probed_cells(emb, ivfpq):
    """The shortlist scan carries the cell IN-filter (the predicate
    that becomes partition pruning on a cell-partitioned codes table)."""
    from mcm_problem_f_data_wrangling_spark.operators.similarity import ivfpq_topk

    codes, cb, cents = ivfpq
    q = query_vector_of(emb, 0)
    plan = (
        ivfpq_topk(emb, codes, cb, cents, q, k=10, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "cell" in plan and ("IN (" in plan or "IN (".lower() in plan.lower())
    # the raw table is reached only through the broadcast semi-join
    assert "BroadcastHashJoin" in plan
