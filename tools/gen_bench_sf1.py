#!/usr/bin/env python
"""Deterministic sf1 bench tier generator (r4 verdict task 3).

The driver ships sf{0.001,0.01,0.1} only, and at sf0.1 the headline
suite wall moves inside its own run-to-run spread (r4: +2.6% on a 34.6%
max spread) — round-over-round perf is unmeasurable there.  This tool
builds a 10x tier at ``benchdata/sf1/`` (gitignored, ~1 GB) by
key-shifted replication of sf0.1: each replica offsets every join key
by ``rep * (max_key + 1)`` so referential integrity, key cardinality
ratios, and join selectivities are preserved while fact rows grow 10x.
Replica document texts get a per-replica VOCABULARY RENAMING (every
word w becomes w_r<rep>): each replica is the base corpus under a
bijective token map, so within-replica text statistics — word/bigram
document frequencies, lengths, the base's own planted near-dup
structure — are preserved EXACTLY and scale linearly, while
cross-replica shingle overlap is zero.  Three earlier cuts failed
instructively: a ' r<rep>' suffix made every replica a J~0.97
near-duplicate of its base (groups of 10 near-identical docs saturate
the exact-Jaccard audit operators quadratically — x_lsh_recall_gate
288 s, x_dedup_clusters_cc hung); a cyclic word ROTATION only breaks
the ~3 shingles at the cut (J~0.90, same saturation); a hash-keyed
word PERMUTATION broke near-dups but flattened the BIGRAM frequency
distribution (uniform pairs over the ~30-word vocabulary → every
shingle common → prefix filtering pruned nothing and the same ops
degenerated to all-pairs).  Renaming is the only transform here that
preserves the shape dedup cost actually depends on.
Fixed dims (region, nation) copy as-is, like TPC-H.

Everything is derived from the driver's own sf0.1 parquet — no new
synthesis — and the output is written in 32 files per table so scans
parallelize (the single-row-group driver testdata needs spread(); this
tier should not).

Usage: python tools/gen_bench_sf1.py [out_dir] [reps]
Then:  SPARK_GRAFT_SF_DIR=benchdata/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mcm_problem_f_data_wrangling_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

# table -> {column: shift_group}; columns sharing a group get the same
# offset so foreign keys keep resolving after the shift
KEY_GROUPS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ("region", "nation")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "benchdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("gen_bench_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    # one offset per key group: max over every column in the group + 1
    offsets: dict[str, int] = {}
    for tbl, cols in KEY_GROUPS.items():
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        for col, grp in cols.items():
            m = df.agg(F.max(col)).collect()[0][0] or 0
            offsets[grp] = max(offsets.get(grp, 0), int(m) + 1)

    for tbl in COPY_AS_IS:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{tbl}.parquet"
        )
        print(f"{tbl}: copied")

    for tbl, cols in KEY_GROUPS.items():
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        parts = []
        for rep in range(reps):
            d = base
            for col, grp in cols.items():
                d = d.withColumn(col, (F.col(col) + F.lit(rep * offsets[grp])).cast("long"))
            if tbl == "documents" and rep > 0:
                words = F.split(F.trim("text"), r"\s+")
                renamed = F.transform(
                    words, lambda w: F.concat(w, F.lit(f"_r{rep}"))
                )
                d = d.withColumn("text", F.array_join(renamed, " "))
                d = d.withColumn("n_chars", F.length("text").cast("long"))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
        n = spark.read.parquet(f"{out_dir}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows x{reps}")

    spark.stop()


if __name__ == "__main__":
    main()
