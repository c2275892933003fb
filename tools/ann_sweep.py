#!/usr/bin/env python
"""ANN quality/cost sweep: recall@k and latency of IVF search vs the
brute-force exact baseline, across n_probe settings.

The scale claim behind IVF ("probe 1/N of cells, keep most of the
recall") should be MEASURED, not asserted — this tool trains the
spherical-k-means quantizer on the test embeddings, then for a panel
of query vectors sweeps n_probe and reports mean recall@10 against
exact brute force plus the scanned-fraction each probe level implies.

Usage:

    python tools/ann_sweep.py [sf_dir] [n_cells] [n_queries]

Prints one JSON line per n_probe plus a summary line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from mcm_problem_f_data_wrangling_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    query_vector_of,
    train_ivf_cells,
)
from mcm_problem_f_data_wrangling_spark.session import get_spark  # noqa: E402

K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("ann_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()

    t0 = time.time()
    assigned, _cents = train_ivf_cells(emb, k=n_cells)
    assigned = assigned.cache()
    assigned.count()
    train_s = round(time.time() - t0, 2)

    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").limit(n_queries * 7).collect()][:: 7][:n_queries]
    queries = [(i, query_vector_of(emb, i)) for i in ids]

    exact: dict[int, set] = {}
    t0 = time.time()
    for qid, qv in queries:
        exact[qid] = {
            r["vec_id"] for r in brute_force_topk(emb, qv, k=K).collect()
        }
    brute_s = round((time.time() - t0) / n_queries, 3)

    for n_probe in (1, 2, 3, 5):
        t0 = time.time()
        recalls = []
        for qid, qv in queries:
            got = {
                r["vec_id"]
                for r in ivf_topk(
                    assigned, qv, k=K, cell_col="cell", n_probe=n_probe
                ).collect()
            }
            recalls.append(len(got & exact[qid]) / K)
        print(
            json.dumps(
                {
                    "n_probe": n_probe,
                    "scan_fraction": round(n_probe / n_cells, 3),
                    "recall_at_10": round(sum(recalls) / len(recalls), 3),
                    "sec_per_query": round((time.time() - t0) / n_queries, 3),
                }
            )
        )
    print(
        json.dumps(
            {
                "stage": "summary",
                "n_vectors": n_vec,
                "n_cells": n_cells,
                "n_queries": n_queries,
                "train_seconds": train_s,
                "brute_force_sec_per_query": brute_s,
            }
        )
    )


if __name__ == "__main__":
    main()
