#!/usr/bin/env python
"""Graph scale smoke at 20M nodes / 100M edges (r4 verdict task 6).

The round-4 smoke proved connected components at 2M nodes; this tool
runs CC + k-core + PageRank an order of magnitude up and RECORDS the
per-iteration shuffle volume, so the parquet-backed iteration
discipline is measured, not asserted:

- edges are synthesized JVM-side (chain + 4 hash-random out-edges per
  node -> ~100M directed edges after the chain), written to parquet
  once, and every operator reads that same table;
- CC and k-core expose an ``on_round`` hook; the callback here samples
  cumulative shuffle read/write bytes from the Spark UI REST API after
  every round, so the output shows whether per-round shuffle volume
  stays FLAT (the design claim: each round shuffles O(|edges| + |nodes|),
  never grows with round count);
- PageRank builds one lazy plan over all iterations (fixed shallow
  depth, documented in operators/graph.py), so it is measured per
  ITERATION-COUNT instead: total shuffle at iters=1/2/3, whose deltas
  are the per-iteration cost.

Prints one JSON line per stage + per-round records.  Results are
committed to SCALE.md, not to a driver artifact.

Usage: python tools/graph_scale_smoke.py [n_nodes] [extra_edges_per_node]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from mcm_problem_f_data_wrangling_spark.operators.graph import (  # noqa: E402
    connected_components,
    k_core,
    pagerank,
)
from mcm_problem_f_data_wrangling_spark.session import get_spark  # noqa: E402


def shuffle_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    completed stages, via the UI REST API (local mode: port 4040)."""
    ui = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return rd, wr


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    fanout = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    # the engine session disables the UI; this tool NEEDS the REST API
    spark = get_spark("graph_scale_smoke", extra_conf={"spark.ui.enabled": "true"})
    assert spark.sparkContext.uiWebUrl, (
        "UI REST API unavailable — a uiless session from another tool is "
        "being reused; run this smoke in a fresh interpreter"
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="graph_smoke_")
    try:
        t0 = time.time()
        ids = spark.range(n_nodes)
        chain = ids.filter(F.pmod(F.xxhash64("id"), F.lit(4)) != 0).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        rnd = ids.select(
            F.col("id").alias("src"),
            F.explode(
                F.array(*[F.pmod(F.xxhash64("id", F.lit(7 + i)), F.lit(n_nodes)) for i in range(fanout)])
            ).alias("dst"),
        )
        chain.unionByName(rnd).filter(F.col("src") != F.col("dst")).write.mode(
            "overwrite"
        ).parquet(f"{base}/edges")
        edges = spark.read.parquet(f"{base}/edges")
        n_edges = edges.count()
        print(
            json.dumps(
                {
                    "stage": "synthesize+write",
                    "seconds": round(time.time() - t0, 1),
                    "n_nodes": n_nodes,
                    "n_edges": n_edges,
                }
            ),
            flush=True,
        )

        def run_with_rounds(label, fn):
            rounds: list[dict] = []
            state = {"rd": 0, "wr": 0, "t": time.time()}
            state["rd"], state["wr"] = shuffle_totals(spark)

            def on_round(i: int) -> None:
                rd, wr = shuffle_totals(spark)
                now = time.time()
                rounds.append(
                    {
                        "round": i,
                        "seconds": round(now - state["t"], 1),
                        "shuffle_read_gb": round((rd - state["rd"]) / 2**30, 2),
                        "shuffle_write_gb": round((wr - state["wr"]) / 2**30, 2),
                    }
                )
                state["rd"], state["wr"], state["t"] = rd, wr, now

            t0 = time.time()
            n = fn(on_round)
            print(
                json.dumps(
                    {
                        "stage": label,
                        "seconds": round(time.time() - t0, 1),
                        "rows_out": n,
                        "rounds": rounds,
                    }
                ),
                flush=True,
            )

        run_with_rounds(
            f"connected_components_{n_nodes // 10**6}m_nodes",
            lambda cb: connected_components(edges, on_round=cb).count(),
        )
        # k=8 sits just under the ~9.5 average symmetrized degree of the
        # chain+random graph, so the peel genuinely removes tails and
        # cascades for several rounds (k=3 keeps everything — no peel)
        run_with_rounds(
            f"k_core_k8_{n_nodes // 10**6}m_nodes",
            lambda cb: k_core(edges, k=8, on_round=cb).count(),
        )

        # PageRank: one lazy plan per iteration count; per-run totals at
        # iters=1/2/3, whose deltas are the per-iteration shuffle cost.
        # The action MUST consume rank values — .count() lets Catalyst
        # ELIMINATE the final left join (unique right keys, no right
        # column referenced) and with it every iteration's compute, so
        # a count-based "bench" times an empty plan.  SUM(rank_fp)
        # (also the convergence scalar a production run would pull)
        # keeps the whole iteration chain live.
        prev = shuffle_totals(spark)
        prev_t = time.time()
        for iters in (1, 2, 3):
            chk = pagerank(edges, iters=iters).agg(F.sum("rank_fp")).collect()[0][0]
            cur = shuffle_totals(spark)
            now = time.time()
            print(
                json.dumps(
                    {
                        "stage": f"pagerank_iters_{iters}",
                        "seconds": round(now - prev_t, 1),
                        "rank_fp_sum": int(chk),
                        "shuffle_read_gb": round((cur[0] - prev[0]) / 2**30, 2),
                        "shuffle_write_gb": round((cur[1] - prev[1]) / 2**30, 2),
                    }
                ),
                flush=True,
            )
            prev, prev_t = cur, now
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
