"""Connected components over a pair list — the clustering stage that
turns near-dup PAIRS (operators/dedup.py) into dedup GROUPS, so a
pipeline can keep one canonical document per group.

The reference has no iterative operators (its dataflow is a single
linear extract pass); this is part of the LLM-data-pipeline extension
surface, where "cluster the candidate pairs, keep min-id per cluster"
is the standard final step of MinHash dedup at scale.

Algorithm: iterative min-label propagation expressed in DataFrame ops —
every node repeatedly adopts the smallest label among itself and its
neighbors until a fixpoint. Iterations = graph diameter, which for
dedup graphs is tiny (dup clusters are near-cliques, diameter ~2-3).

Scale notes (100 TB / billions of edges):
- each iteration is one edge-join + one min-groupBy: two shuffles, both
  on the node key, so the partitioning is REUSED across iterations
  rather than re-derived.
- ``localCheckpoint`` truncates the lineage each round — without it the
  plan doubles per iteration and Catalyst analysis time explodes (the
  classic iterative-Spark failure mode).
- convergence is a driver-side scalar (count of label changes), not a
  collect of data.
- for adversarial graphs with large diameter (long chains), swap the
  propagation body for the alternating large-star/small-star rounds of
  Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC
  '14) — same join/groupBy primitives, O(log n) rounds. Not needed for
  dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """(src, dst) pair list -> (node, component) where component is the
    minimum node id reachable from ``node``. Nodes appearing only in
    ``edges`` are covered; isolated nodes (no edges) are the caller's
    trivial case (component = self) and are not emitted here.

    The loop EARLY-EXITS at the fixpoint (zero label changes) rather
    than running ``max_iter`` rounds — for dedup graphs (near-clique
    clusters, diameter ~2-3) that is 3-4 rounds, and each skipped
    round saves an edge-join + min-groupBy pass over the full graph.
    Pass ``stats`` (a dict) to receive ``rounds`` and the per-round
    ``changed`` counts for profiling."""
    # undirected: keep both orientations once, deduped.
    # PERSISTED pre-partitioned on the join key b — persist (not
    # localCheckpoint) on purpose: an InMemoryRelation carries its
    # outputPartitioning into every round's join, so the EDGE SET —
    # the big side, |E| rows — is shuffled ONCE here and never again,
    # while a checkpoint's Scan ExistingRDD forgets the partitioning
    # and re-exchanges all edges every round (measured 1.9x slower at
    # 26M edges, BASELINE.md). Edges are static across rounds so there
    # is no lineage growth to truncate; labels keep localCheckpoint
    # because they change per round.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition("b")
        .persist()
    )

    try:
        return _cc_loop(sym, max_iter, stats)
    finally:
        # the final labels checkpoint is materialized (eager + the
        # per-round count actions), so the edge cache can be dropped on
        # every exit path — including a mid-loop failure.
        sym.unpersist()


def _cc_loop(sym: DataFrame, max_iter: int, stats: dict | None) -> DataFrame:
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )

    if stats is not None:
        stats["rounds"] = 0
        stats["changed"] = []
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.col("nbr_label")).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter("changed").count()
        labels = new_labels.drop("changed")
        if stats is not None:
            stats["rounds"] += 1
            stats["changed"].append(n_changed)
        if n_changed == 0:
            break

    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """Near-dup pairs -> one row per clustered doc: (doc_id, cluster_id,
    cluster_size, is_canonical). cluster_id is the min doc id in the
    cluster; the canonical doc is the one a dedup pipeline keeps."""
    from pyspark.sql import Window

    cc = connected_components(pairs, src=d1, dst=d2)
    w = Window.partitionBy("component")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count("*").over(w).alias("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
