"""Iterative graph algorithms beyond connected components
(operators/cluster.py): PageRank and k-core decomposition over an
edge DataFrame.

The reference has no iterative operators at all (its dataflow is one
linear extract pass, src/app.py:97-189); this extends the engine's
iterative family — dedup clustering needs connected components, and
rank/centrality over similarity or citation graphs is the next diagnostic
a data-curation pipeline reaches for (e.g. graph-based quality signals
over a link or co-occurrence graph).

Scale posture (mirrors the CC lessons, BASELINE.md):
- the per-edge weight table (src, dst, 1/outdeg) is built ONCE,
  repartitioned on the join key and persisted — an InMemoryRelation
  keeps its outputPartitioning visible to every iteration's join, so
  the |E|-row side never re-shuffles (a localCheckpoint would forget
  the partitioning: measured 1.9x on CC at 26M edges);
- each iteration shuffles only rank rows (|V|) into the join plus the
  contribution groupBy (partial-aggregated map-side);
- ranks are localCheckpoint-ed per round — lineage truncation for the
  frame that CHANGES, cache-partitioning for the frame that doesn't;
- dangling mass (rank parked on sink nodes) is a one-scalar collect
  per round, like CC's convergence count — never a data collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Standard damped PageRank: returns (node, rank) with ranks summing
    to 1 over all nodes appearing in ``edges``. Parallel edges act as
    weight multiplicity; sink (dangling) nodes redistribute their rank
    uniformly each round, so mass is conserved. ``tol``: optional L1
    early-exit — iteration stops when sum(|r_t - r_{t-1}|) < tol (costs
    one extra |V| join per round); None runs exactly ``max_iter``
    rounds. ``stats`` (dict) receives ``rounds`` and the per-round L1
    deltas when ``tol`` is set."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("t").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    outdeg = e.groupBy("s").agg(F.count("*").alias("outdeg"))
    # edge weights built once, partitioned on the per-round join key
    ew = (
        e.join(outdeg, "s")
        .select("s", "t", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition("s")
        .persist()
    )
    ew.count()
    # nodes with no out-edges park their rank: track them once
    sinks = nodes.join(
        outdeg.select(F.col("s").alias("node")), "node", "left_anti"
    ).persist()

    ranks = nodes.select(
        "node", (F.lit(1.0) / F.lit(float(n))).alias("rank")
    ).localCheckpoint(eager=True)

    if stats is not None:
        stats["rounds"] = 0
        stats["l1"] = []
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        dangling = (
            sinks.join(ranks, "node").agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        contribs = (
            ew.join(ranks.withColumnRenamed("node", "s"), "s")
            .select(F.col("t").alias("node"), (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if stats is not None:
            stats["rounds"] += 1
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "new_rank")
                .join(ranks, "node")
                .agg(F.sum(F.abs(F.col("new_rank") - F.col("rank"))))
                .collect()[0][0]
            )
            if stats is not None:
                stats["l1"].append(delta)
            ranks = new_ranks
            if delta < tol:
                break
        else:
            ranks = new_ranks

    for cached in (nodes, ew, sinks):
        cached.unpersist()
    return ranks


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 100,
    stats: dict | None = None,
) -> DataFrame:
    """k-core of an undirected graph by iterative peeling: repeatedly
    remove nodes whose degree within the surviving subgraph is < ``k``
    until a fixpoint; returns ``(node, core_degree)`` for the nodes of
    the (unique, maximal) k-core with their within-core degree.

    ``edges`` lists each undirected edge ONCE (either orientation);
    parallel edges are collapsed. The reference has no graph operators
    (its dataflow is one linear extract pass, /root/reference/src/
    app.py:97-189); k-core is the standard density filter a curation
    pipeline runs over co-occurrence / similarity graphs to isolate
    the stable community from the sparse periphery (complements
    PageRank's centrality and CC's reachability).

    Scale shape (the CC/PageRank lessons, BASELINE.md):
    - the symmetric adjacency is materialized ONCE, repartitioned on
      the degree-count key and persisted, so every round's groupBy
      reuses the exchange instead of re-shuffling |E| rows;
    - each round removes nodes by anti-joining the adjacency against
      the cumulative removed set — |removed| rows, broadcast-sized in
      the common case and never carrying edge payloads;
    - the removed set is the only frame whose lineage grows; it is
      localCheckpoint-ed each round (it is |V|-bounded and small), the
      adjacency is never checkpointed so its cached partitioning stays
      visible (a localCheckpoint would forget it: measured 1.9x on CC
      at 26M edges);
    - convergence is a one-scalar count per round, never a collect of
      node data.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    # symmetric, deduped adjacency: one row per (node, neighbor)
    adj = (
        e.select("u", "v")
        .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .repartition("u")
        .persist()
    )
    adj.count()

    spark = edges.sparkSession
    removed = spark.createDataFrame(
        [], schema=adj.select(F.col("u").alias("node")).schema
    ).localCheckpoint(eager=True)
    if stats is not None:
        stats["rounds"] = 0
    for _ in range(max_iter):
        ra = removed.select(F.col("node").alias("u"))
        rb = removed.select(F.col("node").alias("v"))
        deg = (
            adj.join(F.broadcast(ra), "u", "left_anti")
            .join(F.broadcast(rb), "v", "left_anti")
            .groupBy("u")
            .agg(F.count("*").alias("d"))
        )
        low = deg.filter(F.col("d") < k).select(F.col("u").alias("node"))
        n_low = low.count()
        if stats is not None:
            stats["rounds"] += 1
        if n_low == 0:
            core = deg.select(F.col("u").alias("node"), F.col("d").alias("core_degree"))
            out = core.localCheckpoint(eager=True)
            adj.unpersist()
            return out
        removed = removed.union(low).localCheckpoint(eager=True)
    raise RuntimeError(f"kcore did not converge in {max_iter} rounds")
