"""Distributed PageRank over an edge list — graph centrality for the
near-dup/link graphs the dedup suite already builds (beyond-reference; the
reference has no graph surface, SURVEY §2.7 north star alongside
``dedup.connected_components``).

Scale posture: each power iteration is ONE shuffle — contributions
``rank/out_degree`` grouped by destination (map-side partial agg; Catalyst
plans it like any sum). Degrees are computed once and join by node id
(id-only shuffle). Dangling-node mass is a 1-row aggregate broadcast into
the update (never a driver-side loop over nodes). Lineage is truncated with
``localCheckpoint`` every few iterations — the bpe_train/global_rank
pattern — so 20 iterations cannot OOM the planner. Rank frame is
node-count-sized and stays distributed; nothing corpus-sized ever reaches
the driver.

Rows-only in the driver contract (fixed-point float iteration with
aggregation per step is not expressible in DuckDB's recursive CTEs);
pytest pins it against an in-memory NumPy power iteration and the
sum-to-one invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """PageRank over directed ``(src, dst)`` edges (self-loops allowed,
    parallel edges count once — dedup them first if that is not intended).

    Nodes = union of srcs and dsts. Returns (node, rank) with
    ``sum(rank) == 1`` (dangling mass redistributed uniformly each step).
    """
    # persist the deduped edge list: every iteration (and every eager
    # checkpoint) joins against it, and the caller's edge source may be an
    # expensive derivation (e.g. the Jaccard shingle self-join)
    edges = edges.select("src", "dst").distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # out-degree table: nodes with no out-edges are dangling (deg null)
    nd = nodes.join(deg, nodes.node == deg.src, "left").select("node", "deg").persist()
    ranks = nd.select("node", F.lit(1.0 / n).alias("rank"), "deg")
    try:
        for it in range(max_iter):
            contrib = (
                ranks.where(F.col("deg").isNotNull())
                .join(edges, ranks.node == edges.src)
                .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("inflow"))
            )
            dangling = (
                ranks.where(F.col("deg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            ranks = (
                nd.join(contrib, nd.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce(F.col("inflow"), F.lit(0.0)) + F.col("dm") / n)
                    ).alias("rank"),
                    "deg",
                )
            )
            if (it + 1) % checkpoint_every == 0:
                ranks = ranks.localCheckpoint(eager=True)
        # final eager checkpoint: the persisted inputs are unpersisted on
        # the way out, so the returned frame must not keep them (or the
        # iteration lineage) as dependencies
        ranks = ranks.select("node", F.round("rank", 8).alias("rank")).localCheckpoint(
            eager=True
        )
        return ranks
    finally:
        edges.unpersist()
        nodes.unpersist()
        nd.unpersist()


def pagerank_docs(
    documents: DataFrame, threshold: float = 0.4, max_iter: int = 6
) -> DataFrame:
    """Centrality of documents in the near-dup similarity graph: exact
    Jaccard pairs as undirected edges, PageRank over them — high-rank docs
    sit in the middle of big duplicate families (a prioritization signal
    for manual dedup review). Isolated docs are absent (no edges).

    Output: (doc_id, rank) ordered by rank desc, doc_id asc.
    """
    from baum_welch_spark.operators.dedup import neardup_jaccard

    pairs = neardup_jaccard(documents, threshold=threshold)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return (
        pagerank(edges, max_iter=max_iter)
        .select(F.col("node").alias("doc_id"), "rank")
        .orderBy(F.desc("rank"), F.asc("doc_id"))
    )
