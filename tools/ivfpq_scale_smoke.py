#!/usr/bin/env python
"""IVF-PQ at 1M vectors: measure the cell-pruning claim (VERDICT r5
task 7).

The 100 TB story for IVF-PQ is that the codes table is written
PARTITIONED BY cell, so an n_probe search prunes the scan to
n_probe/k_cells of the index *files* — partition pruning, not a
filter.  Below the claim is measured, not asserted:

1. generate 1M deterministic 64-d vectors JVM-side (64 planted
   clusters + per-id noise, pure ``transform`` arithmetic — no driver
   materialization of the corpus),
2. ``ivfpq_build`` (bounded-sample numpy trainers + distributed
   assign/encode maps), write codes ``partitionBy("cell")``,
3. for each n_probe: run the ADC scan over the partitioned codes and
   record (a) distinct ``input_file_name()`` actually read vs the
   table's total file count — the pruning evidence — and (b) the ADC
   top-k wall vs the exact brute-force wall over raw vectors.

Usage:

    SPARK_DRIVER_MEM=48g python tools/ivfpq_scale_smoke.py \
        [n_vectors] [k_cells] [out_dir]

Prints one JSON line per n_probe plus a summary line (paste into
SCALE.md).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mcm_problem_f_data_wrangling_spark.operators.similarity import (  # noqa: E402
    _adc_dist_col,
    brute_force_topk,
    ivfpq_build,
)
from mcm_problem_f_data_wrangling_spark.session import get_spark  # noqa: E402

DIM = 64
K = 10


def cluster_centers(n_clusters: int):
    """Deterministic near-orthogonal cluster centers (seeded Gaussian
    rows are ~orthogonal in 64-d), unit-normalized — the geometry real
    embedding corpora have: distinct clusters at cosine ≈ 0."""
    import numpy as np

    c = np.random.RandomState(42).randn(n_clusters, DIM)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def synth_vectors(spark, n: int, n_clusters: int):
    """1M-scale deterministic clustered vectors, generated JVM-side:
    v = center[id % k] + amp(id) * sin-noise, where centers are a
    seeded near-orthogonal literal (one Catalyst node) and amp ramps
    0.02..0.42 per id — so nearest-neighbor identity is structured
    (low-amp members are the query's true neighbors and leave small
    residuals the PQ codes can rank), like real embedding corpora.
    Pure whole-stage-codegen arithmetic — nothing is collected."""
    cents = F.lit([[float(v) for v in c] for c in cluster_centers(n_clusters)])
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    cid = (F.col("vec_id") % n_clusters).cast("int")
    amp = (0.02 + 0.4 * ((F.col("vec_id") % 997).cast("double") / 997.0)) / math.sqrt(DIM)
    center = F.element_at(cents, cid + 1)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            F.element_at(center, i + 1)
            + amp * F.sin(F.col("vec_id").cast("double") * 7919.0 + i.cast("double") * 104729.0)
        ),
    )
    return base.select("vec_id", vec.alias("embedding"))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "benchdata/ivfpq_1m_codes"
    spark = get_spark("ivfpq_scale_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    emb = synth_vectors(spark, n, n_clusters=k_cells).repartition(32)
    emb = emb.persist()
    t0 = time.time()
    n_rows = emb.count()
    gen_s = round(time.time() - t0, 2)

    t0 = time.time()
    # k_codes=32 (not the gate queries' toy 16): at 1M rows a cell holds
    # ~15k members and 16 codes/subspace cannot rank inside it; 32 is
    # still 16x compression (production PQ uses 256 = 8-bit codes)
    codes, cb, cents = ivfpq_build(emb, k_cells=k_cells, m=8, k_codes=32, iters=3)
    shutil.rmtree(out_dir, ignore_errors=True)
    # repartition on the partition column first: without it every scan
    # task writes a sliver into every cell directory (32 tasks x 64
    # cells = 2048 tiny files); with it each cell lands in ~1 file —
    # the layout a production index build would produce
    codes.repartition(k_cells, "cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(out_dir)
    build_s = round(time.time() - t0, 2)

    codes_pq = spark.read.parquet(out_dir)
    total_files = len(
        [
            os.path.join(r, f)
            for r, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
    )

    # query = a planted cluster center + small offset (never an exact
    # corpus row)
    import numpy as np

    c7 = cluster_centers(k_cells)[7]
    qv = [float(v + 0.01) for v in c7]
    # shortlist scales with corpus size (FAISS practice): a fixed 200
    # is 13% of a 100k/64 cell but 1.3% of a 1M/64 cell
    shortlist = max(200, n // 1000)
    t0 = time.time()
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=K).collect()}
    brute_s = round(time.time() - t0, 2)

    q = np.asarray(qv, dtype=float)
    qn = q / (np.linalg.norm(q) or 1.0)
    sims = []
    for i, c in enumerate(cents):
        cv = np.asarray(c, dtype=float)
        nrm = np.linalg.norm(cv)
        sims.append((float(qn @ (cv / nrm)) if nrm else -1.0, i))
    order = [i for _, i in sorted(sims, reverse=True)]

    print(
        json.dumps(
            {
                "n_vectors": n_rows,
                "k_cells": k_cells,
                "gen_s": gen_s,
                "build_write_s": build_s,
                "total_code_files": total_files,
                "brute_force_s": brute_s,
                "shortlist": shortlist,
            }
        ),
        flush=True,
    )

    for n_probe in (1, 2, 4, 8):
        probed = order[:n_probe]
        # per-cell residual ADC over the PARTITIONED codes table — the
        # same expression ivfpq_topk builds, but driven through the
        # on-disk layout so partition pruning is what's measured
        dist = None
        for cell in probed:
            rq = [float(q[p] - cents[cell][p]) for p in range(DIM)]
            cell_dist = _adc_dist_col(cb, rq)
            dist = (
                F.when(F.col("cell") == cell, cell_dist)
                if dist is None
                else dist.when(F.col("cell") == cell, cell_dist)
            )
        scan = codes_pq.filter(F.col("cell").isin(probed))
        files_read = scan.select(F.input_file_name()).distinct().count()
        t0 = time.time()
        sl = {
            r["vec_id"]
            for r in scan.select("vec_id", dist.alias("adc"))
            .orderBy("adc", "vec_id")
            .limit(shortlist)
            .collect()
        }
        adc_s = round(time.time() - t0, 2)
        # exact rerank of the 200-deep shortlist (broadcast semi-join)
        cand = emb.join(
            F.broadcast(spark.createDataFrame([(i,) for i in sl], "vec_id long")),
            "vec_id",
        )
        got = {r["vec_id"] for r in brute_force_topk(cand, qv, k=K).collect()}
        print(
            json.dumps(
                {
                    "n_probe": n_probe,
                    "files_read": files_read,
                    "total_files": total_files,
                    "scan_fraction": round(files_read / total_files, 4),
                    "adc_scan_s": adc_s,
                    "recall_at_10": round(len(exact & got) / K, 2),
                }
            ),
            flush=True,
        )

    # --- incremental append (ivfpq_encode): a 10% delta of NEW vectors
    # encoded against the FROZEN codebooks and appended under the same
    # partitionBy(cell) layout — the daily-index-growth path.  Measures
    # (a) append wall (one map + one cell-keyed write, no retraining),
    # (b) that the merged index stays exactly cell-pruned, (c) that a
    # delta vector is immediately searchable.
    from mcm_problem_f_data_wrangling_spark.operators.similarity import (
        ivfpq_encode,
    )

    n_delta = n // 10
    delta = synth_vectors(spark, n + n_delta, n_clusters=k_cells).filter(
        F.col("vec_id") >= n
    )
    t0 = time.time()
    ivfpq_encode(delta, cb, cents).repartition(k_cells, "cell").write.partitionBy(
        "cell"
    ).mode("append").parquet(out_dir)
    append_s = round(time.time() - t0, 2)
    merged = spark.read.parquet(out_dir)
    probed = order[:2]
    scan = merged.filter(F.col("cell").isin(probed))
    files_read = scan.select(F.input_file_name()).distinct().count()
    total_after = len(
        [
            os.path.join(r, f)
            for r, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        ]
    )
    print(
        json.dumps(
            {
                "incremental_delta": n_delta,
                "append_s": append_s,
                "merged_rows": merged.count(),
                "files_read_nprobe2": files_read,
                "total_files_after": total_after,
            }
        ),
        flush=True,
    )
    emb.unpersist()


if __name__ == "__main__":
    main()
