"""PageRank (operators/graph.py): NumPy power-iteration oracle, mass
conservation, dangling handling, and the doc-graph face."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.graph import pagerank, pagerank_docs
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


def test_pagerank_docs_face(spark):
    docs = load_table(spark, SF0001, "documents")
    ranked = pagerank_docs(docs).collect()
    assert len(ranked) > 0
    total = sum(r.rank for r in ranked)
    assert abs(total - 1.0) < 1e-4
    # descending order with deterministic tiebreak
    vals = [(-r.rank, r.doc_id) for r in ranked]
    assert vals == sorted(vals)
