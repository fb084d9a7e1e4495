"""PageRank (operators/graph.py): NumPy power-iteration oracle, mass
conservation, dangling handling, and the doc-graph face."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.graph import _pagerank_step, pagerank, pagerank_docs
from baum_welch_spark.plans.audit import _shuffle_count, explain_str
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


def _numpy_pagerank(edge_list, damping=0.85, iters=10):
    nodes = sorted({a for a, _ in edge_list} | {b for _, b in edge_list})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in set(edge_list):
        out[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1.0 - damping) / n)
        dangling = r[out == 0].sum()
        new += damping * dangling / n
        for a, b in set(edge_list):
            new[idx[b]] += damping * r[idx[a]] / out[idx[a]]
        r = new
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    edge_list = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (6, 3)]
    edges = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(edges, max_iter=10).collect()}
    expect = _numpy_pagerank(edge_list, iters=10)
    assert set(got) == set(expect)
    for v in expect:
        assert abs(got[v] - expect[v]) < 1e-6, (v, got[v], expect[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_dangling_mass_conserved(spark):
    # node 3 is dangling (no out-edges)
    edges = spark.createDataFrame([(1, 3), (2, 3)], schema="src bigint, dst bigint")
    got = {r.node: r.rank for r in pagerank(edges, max_iter=5).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got[3] > got[1] == got[2]


def test_pagerank_step_shuffle_pin(spark):
    # Scale-posture pin (VERDICT-r5 #5): with the loop's inputs persisted
    # PRE-PARTITIONED on their join keys (exactly what pagerank() does —
    # edges by src, nd by node), one power iteration must insert at most 2
    # runtime (ENSURE_REQUIREMENTS) exchanges: the grouped inflow sum and
    # the 1-row dangling-mass gather. In particular the EDGE-SIZED side of
    # the contribution join must reuse the cached hashpartitioning(src)
    # and never re-shuffle — at 100 TB that is the shuffle that matters.
    # (The real loop's ranks side adds one node-sized exchange after its
    # per-iteration localCheckpoint; node-sized, acceptable.) Fails if
    # someone drops the repartition-before-persist, un-persists, or adds
    # a per-iteration distinct/sort.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    edges = (
        spark.createDataFrame([(1, 2), (2, 3), (3, 1)], schema="src bigint, dst bigint")
        .repartition("src")
        .persist()
    )
    nd = (
        spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, None)], schema="node bigint, deg bigint"
        )
        .repartition("node")
        .persist()
    )
    try:
        edges.count(), nd.count()
        ranks = nd.select("node", F.lit(0.25).alias("rank"), "deg")
        step = _pagerank_step(ranks, nd, edges, damping=0.85, n=4)
        plan = explain_str(step, "simple")
        runtime_shuffles = plan.count("ENSURE_REQUIREMENTS")
        assert runtime_shuffles <= 2, f"step plans {runtime_shuffles} runtime shuffles:\n{plan}"
        # the dangling-mass aggregate must enter as a broadcast, not an
        # exchange-backed join
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
        got = {r.node: r.rank for r in step.collect()}  # pinned plan must run
        assert abs(sum(got.values()) - 1.0) < 1e-9
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        edges.unpersist()
        nd.unpersist()


def test_pagerank_docs_minhash_pair_source_same_ranking(spark):
    # VERDICT-r5 #4: the banded MinHash pair generator (the 100 TB path)
    # must rank the planted duplicate family the same way the exact
    # Jaccard edge source does — compare by rank order over the common
    # doc set (Spearman on shared docs), not float equality, since the
    # candidate sets can differ at the threshold margin.
    from baum_welch_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF0001, "documents")
    exact = pagerank_docs(docs).collect()
    banded = pagerank_docs(
        docs,
        pair_generator=lambda d: minhash_lsh_pairs(d, verify_threshold=0.4),
    ).collect()
    assert len(banded) > 0
    pos_e = {r.doc_id: i for i, r in enumerate(exact)}
    pos_b = {r.doc_id: i for i, r in enumerate(banded)}
    common = sorted(set(pos_e) & set(pos_b))
    assert len(common) >= 3, "MinHash path lost the duplicate families entirely"
    xa = np.argsort([pos_e[d] for d in common])
    xb = np.argsort([pos_b[d] for d in common])
    n = len(common)
    if n > 1:
        rho = np.corrcoef(xa, xb)[0, 1]
        assert rho > 0.8, f"rank correlation {rho} over {n} common docs"
    # both paths must agree on sum-to-one
    assert abs(sum(r.rank for r in banded) - 1.0) < 1e-4


def test_pagerank_docs_face(spark):
    docs = load_table(spark, SF0001, "documents")
    ranked = pagerank_docs(docs).collect()
    assert len(ranked) > 0
    total = sum(r.rank for r in ranked)
    assert abs(total - 1.0) < 1e-4
    # descending order with deterministic tiebreak
    vals = [(-r.rank, r.doc_id) for r in ranked]
    assert vals == sorted(vals)


# -- triangle counting ------------------------------------------------------


def _brute_triangles(edge_list):
    adj = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in adj[x]:
            if y <= x:
                continue
            for z in adj[x] & adj[y]:
                if z > y:
                    for v in (x, y, z):
                        counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce_random_graph(spark):
    from baum_welch_spark.operators.graph import triangle_counts

    rng = np.random.default_rng(7)
    n = 40
    edge_list = [
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(300, 2))
        if a != b
    ]
    # duplicates + both orientations included on purpose: triangle_counts
    # must canonicalize
    edge_list += [(b, a) for a, b in edge_list[:50]]
    edges = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == _brute_triangles(edge_list)


def test_triangle_counts_planted_clique_and_hub(spark):
    """A k-clique member sits in C(k-1, 2) triangles; a pure hub (star
    center) sits in none — the distinction the operator exists to make."""
    from baum_welch_spark.operators.graph import triangle_counts

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]  # K5
    star = [(100, 200 + i) for i in range(6)]  # no closing edges
    edges = spark.createDataFrame(clique + star, schema="src bigint, dst bigint")
    got = {r.node: r.n_triangles for r in triangle_counts(edges).collect()}
    assert got == {v: 6 for v in range(5)}  # C(4,2) = 6 each
    assert 100 not in got  # the hub closes nothing


def test_triangle_counts_plan_no_cartesian_and_bounded_shuffles(spark):
    """Scale-posture pin for the triangle kernel: the wedge and closing
    joins must plan as equi-joins (no BroadcastNestedLoop/cartesian — the
    failure mode if the orientation predicate leaks into a join
    condition), and the plan downstream of the lineage-cut oriented edge
    list stays within its shuffle budget — without the localCheckpoint,
    the canonicalize+degree+attach chain re-plans and re-executes once per
    reference (three times) because Spark plans are trees."""
    from baum_welch_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [(a, b) for a in range(8) for b in range(a + 1, 8)],
        schema="src bigint, dst bigint",
    )
    plan = explain_str(triangle_counts(edges))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # downstream of the checkpoint: wedge join, closing join, member count
    # (+ AQE reads); the pin catches the lineage cut being dropped, which
    # would put the ~80-exchange duplicated chain back into the plan
    assert _shuffle_count(plan) <= 8, plan


def test_clustering_coefficient_clique_hub_and_bridge(spark):
    """cc = 1.0 inside a clique, 0.0 at a star hub (and its leaves), and
    the textbook in-between value on a clique member with one extra
    non-closing edge."""
    from baum_welch_spark.operators.graph import clustering_coefficient

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]  # K4
    star = [(100, 200 + i) for i in range(5)]
    bridge = [(0, 50)]  # node 0: deg 4, still 3 triangles -> cc = 0.5
    edges = spark.createDataFrame(
        clique + star + bridge, schema="src bigint, dst bigint"
    )
    got = {r.node: (r.deg, r.n_triangles, r.cc) for r in clustering_coefficient(edges).collect()}
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0) and got[3] == (3, 3, 1.0)
    assert got[0] == (4, 3, 0.5)
    assert got[100] == (5, 0, 0.0)
    assert got[200] == (1, 0, 0.0)  # degree-1 convention
    assert got[50] == (1, 0, 0.0)
