"""Deep-cascade validation of the x_graph_kcore SQL oracle.

The oracle (`plans/suite_more.py _KCORE_SQL`) unrolls the peel to a
fixed depth (24 rounds) on the grounds that post-fixpoint rounds are
identity.  The driver testdata converges in ONE round (dense
co-purchase graph), so that unroll has never been exercised past
depth 1.  This test plants a lineitem table whose co-purchase graph
peels in a ~10-round cascade and checks the DuckDB oracle against the
Spark engine query on the same parquet — end to end through both
REGISTRY surfaces, exactly like tools/check_parity.py.

Construction (k=4): a 6-clique core (degree 5, survives forever) plus
a chain u_0..u_9 where u_i is adjacent to u_{i-1}, u_{i+1}, and two
core nodes.  u_0 has degree 3 < 4 and peels in round 1; every removal
drops the next chain node to degree 3, so exactly one chain node
peels per round — 10 rounds of genuine shrinkage before the fixpoint.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mcm_problem_f_data_wrangling_spark.plans import REGISTRY

CHAIN = 10  # peel rounds; must stay < the oracle's 24-round unroll


def _edges():
    core = list(range(100, 106))  # 6-clique: degree 5 internally
    es = [(a, b) for i, a in enumerate(core) for b in core[i + 1 :]]
    chain = list(range(CHAIN))  # u_0..u_9
    for i, u in enumerate(chain):
        if i + 1 < len(chain):
            es.append((u, chain[i + 1]))
        # two core anchors keep u at degree 4 until u_{i-1} peels
        es.append((u, core[(2 * i) % 6]))
        es.append((u, core[(2 * i + 1) % 6]))
    # u_9 needs a 4th neighbor so only u_0 starts below degree 4
    es.append((CHAIN - 1, core[5]))
    return es


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("kcore_planted")
    rows = [
        (oid, pk)
        for oid, (a, b) in enumerate(_edges())
        for pk in (a, b)
    ]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(str(base), "lineitem.parquet"))
    return str(base)


def test_planted_peel_depth_is_deep(planted_dir, spark):
    # sanity: the engine needs ~CHAIN rounds, i.e. the cascade is real
    from pyspark.sql import functions as F

    from mcm_problem_f_data_wrangling_spark.operators.graph import (
        symmetrize_edges,
    )

    li = spark.read.parquet(os.path.join(planted_dir, "lineitem.parquet"))
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    cur = {
        (r["a"], r["b"])
        for r in symmetrize_edges(edges).collect()
    }
    rounds = 0
    while True:
        deg: dict[int, int] = {}
        for x, _ in cur:
            deg[x] = deg.get(x, 0) + 1
        keep = {n for n, d in deg.items() if d >= 4}
        nxt = {(x, y) for x, y in cur if x in keep and y in keep}
        if nxt == cur:
            break
        cur = nxt
        rounds += 1
    assert rounds >= CHAIN  # one chain node per round
    assert rounds < 24  # inside the oracle's unroll margin


def test_oracle_matches_engine_on_deep_cascade(planted_dir, spark):
    q = REGISTRY["x_graph_kcore"]
    got = sorted(r["node"] for r in q.spark(spark, planted_dir).collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{os.path.join(planted_dir, 'lineitem.parquet')}/*.parquet'"
    )
    want = sorted(r[0] for r in con.execute(q.sql).fetchall())

    assert got == want == [100, 101, 102, 103, 104, 105]
