"""Distributed connected components + duplicate-cluster resolution.

The dedup family (``operators/dedup.py``) stops at *candidate pairs*
(LSH buckets, Jaccard bands, fingerprint groups).  A production
training-data pipeline needs one more step: resolve the pair graph into
duplicate CLUSTERS and pick one canonical survivor per cluster —
near-duplication is transitive in practice (A≈B, B≈C ⇒ drop two of
{A,B,C}), so keeping "one per pair" under-deletes.  The reference has
nothing like this (its dedup surface is ``drop_duplicates``,
SURVEY.md §2.2 P11); this is an engine extension on the BASELINE.json
north star, same family as GraphFrames/GraphX connectedComponents.

Algorithm: **min-label propagation with pointer jumping**, pure
DataFrame ops (no RDDs, no Python in the loop):

- state is one (node, comp) table, comp = smallest node id known
  reachable; each round does (1) a neighbor step — every node offers
  its comp to its neighbors via one equi-join on the symmetrized edge
  table — and (2) a pointer-jumping step — comp := comp(comp), which
  short-circuits chains so convergence is O(log diameter) rounds, not
  O(diameter).
- every round ends in ``localCheckpoint(eager=True)``: iterative
  DataFrame algorithms otherwise accumulate an exponentially deep
  lineage that re-executes from the scan each round and eventually
  overflows the planner.
- convergence is detected with a one-number aggregate: labels only
  ever decrease, so SUM(comp) is strictly monotone and stalls exactly
  at the fixpoint.  No row-wise "changed?" join, no driver-side
  collect of labels.

At 100 TB the per-round cost is two shuffles keyed on node id (the
neighbor join and the groupBy-min) over state that is one row per
node — the edge table, typically the larger side, is cached once and
re-shuffled on a stable key, and component count drops geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import exact_dedup_groups, ngram_jaccard_pairs


def symmetrize_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: both directions, self-loops dropped."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    return fwd.unionByName(rev).filter(F.col("a") != F.col("b")).dropDuplicates()


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph → (node, component).

    ``component`` is the smallest node id in the component (a stable,
    deterministic cluster id).  ``nodes`` optionally supplies isolated
    vertices (no incident edges); otherwise the vertex set is derived
    from the edges.

    ``max_iter`` is a safety rail: pointer jumping converges in
    O(log d) rounds (d = graph diameter), so 25 covers diameters past
    a million; hitting the rail raises rather than returning a
    half-merged labeling.
    """
    sym = symmetrize_edges(edges, src, dst)
    if nodes is None:
        vertices = sym.select(F.col("a").alias(node_col)).dropDuplicates()
    else:
        vertices = nodes.select(F.col(node_col)).dropDuplicates()
        # edges may mention vertices absent from `nodes`; the union keeps
        # the label table closed over everything the joins will touch
        vertices = vertices.unionByName(
            sym.select(F.col("a").alias(node_col))
        ).dropDuplicates()
    sym = sym.localCheckpoint(eager=True)  # reused every round: cut lineage once
    labels = vertices.select(
        F.col(node_col), F.col(node_col).alias("component")
    ).localCheckpoint(eager=True)

    def total(lab: DataFrame) -> int:
        # decimal(38) accumulator: SUM over bigint node ids can exceed int64
        return lab.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("t")
        ).collect()[0]["t"]

    prev = total(labels)
    for _ in range(max_iter):
        # 1. neighbor step: each node offers its component to neighbors
        offers = sym.join(
            labels, sym["a"] == labels[node_col], "inner"
        ).select(F.col("b").alias(node_col), "component")
        merged = (
            labels.unionByName(offers)
            .groupBy(node_col)
            .agg(F.min("component").alias("component"))
        )
        # 2. pointer jump: component := component(component).  Every comp
        # value is itself a node id, so the self-join always hits.
        parent = merged.select(
            F.col(node_col).alias("p_node"), F.col("component").alias("p_comp")
        )
        jumped = merged.join(
            parent, merged["component"] == parent["p_node"], "inner"
        ).select(F.col(node_col), F.col("p_comp").alias("component"))
        labels = jumped.localCheckpoint(eager=True)
        cur = total(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def duplicate_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Resolve exact + near-dup evidence into clusters with one survivor.

    Edge set = (a) star edges doc→min-doc within each exact-fingerprint
    group and (b) length-banded token-set Jaccard pairs at
    ``jaccard_threshold`` — the two cheap evidence sources; transitive
    closure across BOTH is what a pairwise keep-rule cannot express.

    Output: (doc_id, cluster_id, is_kept) for EVERY input doc —
    singletons are their own cluster — with is_kept = 1 exactly on the
    min doc_id per cluster (deterministic survivor rule).
    """
    from ..functions.textfn import doc_fingerprint

    groups = exact_dedup_groups(docs, text_col=text_col, id_col=id_col)
    doc_fp = docs.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
    star = (
        doc_fp.join(F.broadcast(groups.select("fingerprint", "keep_doc_id")), "fingerprint")
        .filter(F.col(id_col) != F.col("keep_doc_id"))
        .select(F.col(id_col).alias("src"), F.col("keep_doc_id").alias("dst"))
    )
    jac = ngram_jaccard_pairs(docs, text_col=text_col, id_col=id_col, threshold=jaccard_threshold).select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    comp = connected_components(
        star.unionByName(jac),
        nodes=docs.select(F.col(id_col).alias("node")),
        node_col="node",
    )
    return comp.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("bigint").alias("is_kept"),
    )
