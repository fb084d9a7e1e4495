"""Distributed PageRank over an edge list — graph centrality for the
near-dup/link graphs the dedup suite already builds (beyond-reference; the
reference has no graph surface, SURVEY §2.7 north star alongside
``dedup.connected_components``).

Scale posture: each power iteration is ONE shuffle — contributions
``rank/out_degree`` grouped by destination (map-side partial agg; Catalyst
plans it like any sum). Degrees are computed once and join by node id
(id-only shuffle). Dangling-node mass is a 1-row aggregate broadcast into
the update (never a driver-side loop over nodes). Lineage is truncated with
``localCheckpoint`` once per iteration (the frame is node-count-sized),
which also means the two consumers of each iteration's ranks (contribution
join + dangling-mass aggregate) read materialized partitions instead of
re-evaluating the previous iteration's lineage. Rank frame is
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


def _pagerank_step(
    ranks: DataFrame, nd: DataFrame, edges: DataFrame, damping: float, n: int
) -> DataFrame:
    """One power iteration: (node, rank, deg) -> (node, rank, deg).

    Exactly the plan the module docstring promises — contributions
    ``rank/deg`` joined to edges and grouped by destination (one shuffled
    agg with map-side partial), dangling mass as a 1-row broadcast, and a
    left join back onto the degree table. Extracted so
    ``tests/test_graph.py`` can pin the per-iteration shuffle count; the
    loop in :func:`pagerank` calls this verbatim.
    """
    contrib = (
        ranks.where(F.col("deg").isNotNull())
        .join(edges, ranks.node == edges.src)
        .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("inflow"))
    )
    dangling = ranks.where(F.col("deg").isNull()).agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
    )
    return (
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


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """PageRank over directed ``(src, dst)`` edges (self-loops allowed,
    parallel edges count once — dedup them first if that is not intended).

    Nodes = union of srcs and dsts. Returns (node, rank) with
    ``sum(rank) == 1`` (dangling mass redistributed uniformly each step).
    """
    # persist the deduped edge list PRE-PARTITIONED on the join key: every
    # iteration joins ranks.node == edges.src, and a cached
    # hashpartitioning(src) frame satisfies the join's distribution
    # requirement (canChangeCachedPlanOutputPartitioning=false keeps AQE
    # from re-coalescing it), so the EDGE-SIZED shuffle happens once at
    # setup instead of once per iteration — at 100 TB the edge list dwarfs
    # the node-count-sized rank frame, so this is the shuffle that matters.
    # The caller's edge source may also be an expensive derivation (e.g.
    # the Jaccard shingle self-join), which persist covers too.
    edges = edges.select("src", "dst").distinct().repartition("src").persist()
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
    # out-degree table: nodes with no out-edges are dangling (deg null).
    # Same trick: cache it hashpartitioned(node) so the per-iteration
    # update join never re-shuffles the degree table.
    nd = (
        nodes.join(deg, nodes.node == deg.src, "left")
        .select("node", "deg")
        .repartition("node")
        .persist()
    )
    ranks = nd.select("node", F.lit(1.0 / n).alias("rank"), "deg")
    try:
        for it in range(max_iter):
            # materialize the CURRENT ranks before branching: both contrib
            # and dangling read it, so an unpersisted frame would evaluate
            # the previous iteration's lineage twice per iteration (2^k
            # recomputation growth between the old every-4 checkpoints).
            # The frame is node-count-sized; one eager checkpoint per
            # iteration is cheap and also truncates lineage, so no separate
            # periodic checkpoint is needed.
            ranks = ranks.localCheckpoint(eager=True)
            ranks = _pagerank_step(ranks, nd, edges, damping, n)
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
    documents: DataFrame,
    threshold: float = 0.4,
    max_iter: int = 6,
    pair_generator=None,
) -> DataFrame:
    """Centrality of documents in the near-dup similarity graph: near-dup
    pairs as undirected edges, PageRank over them — high-rank docs sit in
    the middle of big duplicate families (a prioritization signal for
    manual dedup review). Isolated docs are absent (no edges).

    ``pair_generator`` follows the ``clean_corpus``/``canonical_docs``
    convention: ``None`` uses exact trigram Jaccard for oracle parity (the
    all-pairs-flavored shingle join is the scale ceiling); pass a callable
    ``documents -> (doc_a, doc_b, ...)`` such as
    ``lambda d: minhash_lsh_pairs(d)`` for the banded 100 TB path — the
    PageRank core itself is scale-clean either way (one grouped-sum shuffle
    per iteration).

    Output: (doc_id, rank) ordered by rank desc, doc_id asc.
    """
    from baum_welch_spark.operators.dedup import neardup_jaccard

    if pair_generator is None:
        pairs = neardup_jaccard(documents, threshold=threshold)
    else:
        pairs = pair_generator(documents)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    return (
        pagerank(edges, max_iter=max_iter)
        .select(F.col("node").alias("doc_id"), "rank")
        .orderBy(F.desc("rank"), F.asc("doc_id"))
    )
