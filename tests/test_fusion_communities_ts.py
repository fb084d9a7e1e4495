"""Late-r11 additions: RRF hybrid retrieval (operators/fusion.py),
deterministic label propagation (operators/communities.py), per-key EWMA
(operators/timeseries.py), and the bucketed-layout driver face
(sources/bucketing.bucketed_segment_spend)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.sources.io import load_table

from conftest import SF0001


# --------------------------------------------------------------- fusion ----


def _ranked(spark, rows):
    return spark.createDataFrame(rows, schema="q_id int, doc_id bigint, rk bigint")


def test_rrf_fuse_matches_hand_computed_scores(spark):
    from baum_welch_spark.operators.fusion import rrf_fuse

    lex = _ranked(spark, [(0, 10, 1), (0, 11, 2), (0, 12, 3)])
    sem = _ranked(spark, [(0, 11, 1), (0, 13, 2)])
    got = {r.doc_id: (r.rrf, r.rk) for r in rrf_fuse([lex, sem], k_const=60, k=10).collect()}
    # doc 11 appears in both lists: 1/62 + 1/61
    assert got[11][0] == round(1 / 62 + 1 / 61, 6)
    assert got[11][1] == 1  # fused winner despite rank-1 in only one list
    assert got[10][0] == round(1 / 61, 6)
    assert got[13][0] == round(1 / 62, 6)
    assert got[12][0] == round(1 / 63, 6)
    # tie between doc 10 (lex rank 1) and doc 13 (sem... different ks) — no
    # tie here; but ordering must be by (rrf desc, doc_id asc)
    order = [r.doc_id for r in rrf_fuse([lex, sem]).collect()]
    assert order == [11, 10, 13, 12]


def test_rrf_fuse_tiebreaks_on_doc_id(spark):
    from baum_welch_spark.operators.fusion import rrf_fuse

    lex = _ranked(spark, [(0, 20, 1), (0, 5, 2)])
    sem = _ranked(spark, [(0, 5, 1), (0, 20, 2)])
    rows = rrf_fuse([lex, sem]).collect()
    # both docs score 1/61 + 1/62 — identical; smaller doc_id must rank first
    assert [r.doc_id for r in rows] == [5, 20]
    assert rows[0].rrf == rows[1].rrf


def test_hybrid_search_face_shape_and_branch_containment(spark):
    from baum_welch_spark.operators.fusion import hybrid_search
    from baum_welch_spark.operators.retrieval import bm25_topk
    from baum_welch_spark.operators.similarity import knn_brute

    docs = load_table(spark, SF0001, "documents")
    embs = load_table(spark, SF0001, "embeddings")
    got = hybrid_search(docs, embs, n_queries=3, depth=20, k=10).collect()
    assert {r.q_id for r in got} == {0, 1, 2}
    for q in (0, 1, 2):
        rks = [r.rk for r in got if r.q_id == q]
        assert rks == list(range(1, len(rks) + 1))
    # every fused doc must come from one of the two branch top-20 lists
    lex = {(r.q_id, r.doc_id) for r in bm25_topk(docs, k=20).collect()}
    sem = {(r.q_id, r.c_id) for r in knn_brute(embs, n_queries=3, k=20).collect()}
    assert all((r.q_id, r.doc_id) in (lex | sem) for r in got)
    # a doc in BOTH branches outranks the same-single-list doc one rank up:
    # rrf in [1/61, 1/61+1/80] per branch membership — verify score bounds
    for r in got:
        in_both = (r.q_id, r.doc_id) in lex and (r.q_id, r.doc_id) in sem
        if in_both:
            assert r.rrf >= round(2 / 80.0, 6) - 1e-9


def test_semantic_topk_missing_query_row_fails_fast(spark):
    from baum_welch_spark.operators.fusion import semantic_topk

    embs = load_table(spark, SF0001, "embeddings")
    with pytest.raises(ValueError, match="vec_id=999999"):
        semantic_topk(embs, 999999)


# ---------------------------------------------------------- communities ----


def _numpy_lpa(edge_list, iters):
    """Sequential replica of the deterministic synchronous self-inclusive
    rule: plurality over {own label} + in-neighbor labels, ties -> min."""
    edges = set(edge_list)
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    labels = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            votes = [labels[v]] + [labels[a] for (a, b) in edges if b == v]
            counts = {}
            for l in votes:
                counts[l] = counts.get(l, 0) + 1
            top = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == top)
        labels = new
    return labels


def test_label_propagation_matches_sequential_replica(spark):
    from baum_welch_spark.operators.communities import label_propagation

    # two triangles joined by one bridge edge — LPA should find two families
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    edge_list = pairs + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    for iters in (1, 2, 4):
        got = {r.node: r.label for r in label_propagation(edges, max_iter=iters).collect()}
        assert got == _numpy_lpa(edge_list, iters), iters


def test_label_propagation_splits_bridged_cliques(spark):
    from baum_welch_spark.operators.communities import label_propagation

    # two 4-cliques with a single bridge: components would merge them,
    # label propagation keeps them separate
    def clique(base):
        ns = list(range(base, base + 4))
        return [(a, b) for a in ns for b in ns if a != b]

    edge_list = clique(0) + clique(10) + [(3, 10), (10, 3)]
    edges = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    got = {r.node: r.label for r in label_propagation(edges, max_iter=4).collect()}
    left = {got[v] for v in range(0, 4)}
    right = {got[v] for v in range(10, 14)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_no_in_edge_node_keeps_label(spark):
    from baum_welch_spark.operators.communities import label_propagation

    # purely directed: node 1 has no in-edges and must keep its own label
    # (self-vote); node 2 ties {1, 2} -> min = 1
    edges = spark.createDataFrame([(1, 2), (2, 3)], schema="src bigint, dst bigint")
    got = {r.node: r.label for r in label_propagation(edges, max_iter=3).collect()}
    assert got[1] == 1
    assert got[2] == 1


def test_label_propagation_isolated_pair_converges(spark):
    from baum_welch_spark.operators.communities import label_propagation

    # THE motivating case for the self-vote: a symmetrized isolated pair
    # must converge to the min label, not oscillate (sync-LPA 2-cycle)
    edges = spark.createDataFrame(
        [(7, 9), (9, 7)], schema="src bigint, dst bigint"
    )
    for iters in (1, 2, 3, 4):
        got = {r.node: r.label for r in label_propagation(edges, max_iter=iters).collect()}
        assert got == {7: 7, 9: 7}, iters


def test_label_propagation_early_stop_is_a_fixpoint(spark):
    from baum_welch_spark.operators.communities import label_propagation

    # two 4-cliques + bridge settles in <= 2 rounds; early-stop must return
    # exactly what a full fixed-round run returns (a stable round is a
    # fixpoint of the pure update rule)
    def clique(base):
        ns = list(range(base, base + 4))
        return [(a, b) for a in ns for b in ns if a != b]

    edge_list = clique(0) + clique(10) + [(3, 10), (10, 3)]
    edges = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    fixed = {r.node: r.label for r in label_propagation(edges, max_iter=8).collect()}
    early = {
        r.node: r.label
        for r in label_propagation(edges, max_iter=8, stop_when_stable=True).collect()
    }
    assert early == fixed


def test_label_propagation_deterministic_under_repartition(spark):
    from baum_welch_spark.operators.communities import label_propagation

    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4), (8, 9)]
    edge_list = pairs + [(b, a) for a, b in pairs]
    base = spark.createDataFrame(edge_list, schema="src bigint, dst bigint")
    want = {r.node: r.label for r in label_propagation(base, max_iter=4).collect()}
    for n in (1, 7):
        shuffled = base.repartition(n)
        got = {r.node: r.label for r in label_propagation(shuffled, max_iter=4).collect()}
        assert got == want, n


def test_label_prop_docs_face_consistent_with_components(spark):
    from baum_welch_spark.operators.communities import label_prop_docs
    from baum_welch_spark.operators.dedup import neardup_jaccard

    docs = load_table(spark, SF0001, "documents")
    got = label_prop_docs(docs).collect()
    assert len(got) > 0
    by_doc = {r.doc_id: r.community for r in got}
    # every near-dup EDGE's endpoints ended in the same community after 4
    # rounds on this corpus (families are tight cliques), and community ids
    # are member doc ids
    pairs = neardup_jaccard(docs, threshold=0.4).collect()
    assert {p.doc_a for p in pairs} | {p.doc_b for p in pairs} == set(by_doc)
    for p in pairs:
        assert by_doc[p.doc_a] == by_doc[p.doc_b]
    assert set(by_doc.values()) <= set(by_doc)


# ------------------------------------------------------------ timeseries ----


def test_ewma_matches_sequential_recursion(spark):
    from baum_welch_spark.operators.timeseries import ewma_user_spend

    events = load_table(spark, SF0001, "events")
    got = ewma_user_spend(events, alpha=0.5).collect()
    assert len(got) > 0
    # replica: daily sums (4dp) then the recursion, per user
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").cast("date").cast("string").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("spend"))
        .collect()
    )
    series = {}
    for r in sorted(daily, key=lambda r: (r.user_id, r.day)):
        series.setdefault(r.user_id, []).append((r.day, r.spend))
    expect = {}
    for uid, xs in series.items():
        y = xs[0][1]
        expect[(uid, xs[0][0])] = y
        for day, x in xs[1:]:
            y = 0.5 * y + 0.5 * x
            expect[(uid, day)] = y
    assert len(got) == len(expect)
    for r in got:
        assert r.ewma_spend == expect[(r.user_id, r.day)], (r.user_id, r.day)


def test_ewma_alpha_one_is_identity_and_bad_alpha_raises(spark):
    from baum_welch_spark.operators.timeseries import ewma_user_spend

    events = load_table(spark, SF0001, "events")
    rows = ewma_user_spend(events, alpha=1.0).collect()
    for r in rows:
        assert r.ewma_spend == r.spend
    with pytest.raises(ValueError):
        ewma_user_spend(events, alpha=0.0)


def test_ewma_smooths_toward_history(spark):
    from baum_welch_spark.operators.timeseries import ewma_user_spend

    events = load_table(spark, SF0001, "events")
    rows = ewma_user_spend(events).collect()
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.day)):
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for series in by_user.values():
        for prev, cur in zip(series, series[1:]):
            lo = min(prev.ewma_spend, cur.spend) - 1e-9
            hi = max(prev.ewma_spend, cur.spend) + 1e-9
            assert lo <= cur.ewma_spend <= hi
            checked += 1
    assert checked > 10


def test_ewma_all_null_day_is_zero_three_ways(spark):
    """ADVICE r11: a day whose EVERY purchase value is NULL must emit
    spend=0.0 (not NULL, not NaN) and must not poison later days — and the
    batch engine, the DuckDB oracle, and the streaming updater's convention
    (accumulator untouched → 0.0) must all agree."""
    import duckdb
    import math

    from baum_welch_spark.operators.timeseries import ewma_user_spend, ewma_user_spend_sql

    rows = [
        (1, "2024-01-01 10:00:00", 7, "purchase", 10.0, None),
        (2, "2024-01-02 10:00:00", 7, "purchase", None, None),  # all-NULL day
        (3, "2024-01-03 10:00:00", 7, "purchase", 20.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.day: (r.spend, r.ewma_spend) for r in ewma_user_spend(events).collect()}
    assert got["2024-01-02"] == (0.0, 5.0)  # 0.5*10 + 0.5*0
    assert got["2024-01-03"] == (20.0, 12.5)  # no NaN poisoning downstream
    assert not any(math.isnan(v) for pair in got.values() for v in pair)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 10:00:00', 7, 'purchase', 10.0, NULL),"
        "(2, TIMESTAMP '2024-01-02 10:00:00', 7, 'purchase', NULL, NULL),"
        "(3, TIMESTAMP '2024-01-03 10:00:00', 7, 'purchase', 20.0, NULL)"
        ") t(event_id, ts, user_id, event_type, value, props)"
    )
    oracle = {
        d: (s, e) for _, d, s, e in con.execute(ewma_user_spend_sql()).fetchall()
    }
    assert oracle == got

    # third engine: the streaming updater on the same three days (driven
    # directly, the test_streaming_ewma harness pattern) — its all-NULL day
    # must land on the identical (0.0 spend, 5.0 ewma) row
    import pandas as pd

    from baum_welch_spark.streaming.ewma import ewma_stream_updater

    class _State:
        _v = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    update = ewma_stream_updater(alpha=0.5)
    batch = pd.DataFrame(
        {
            "user_id": [7, 7, 7],
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 10:00:00", "2024-01-02 10:00:00", "2024-01-03 10:00:00"]
            ),
            "value": [10.0, None, 20.0],
        }
    )
    out = pd.concat(list(update((7,), iter([batch]), _State())))
    latest = out.groupby("day").last()
    stream_rows = {
        d: (latest.loc[d, "spend"], latest.loc[d, "ewma_spend"]) for d in latest.index
    }
    assert stream_rows == got


# ----------------------------------------------------------- bucketed face ----


def test_bucketed_segment_spend_matches_plain_join(spark):
    from baum_welch_spark.sources.bucketing import bucketed_segment_spend

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    got = bucketed_segment_spend(spark, orders, customer).collect()
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in plain]


def test_bucketed_segment_spend_join_is_exchange_free(spark):
    from baum_welch_spark.plans.audit import plan_report
    from baum_welch_spark.sources.bucketing import (
        bucketed_segment_spend_with_tables,
        cobucketed_join,
    )

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # materialize the face's bucketed tables, then audit the join stage
        out, (orders_tbl, customer_tbl) = bucketed_segment_spend_with_tables(
            spark, orders, customer
        )
        out.collect()
        joined = cobucketed_join(spark, orders_tbl, customer_tbl, "c_custkey")
        rep = plan_report(joined)
        assert rep["shuffles"] == 0, rep
        assert rep["sortmerge_joins"] == 1, rep
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


# --------------------------------------------------------------- baskets ----


def test_basket_rules_hand_computed(spark):
    from baum_welch_spark.operators.basket import basket_rules

    # baskets: {A,B} x3, {A,C} x1, {B,C} x1, {A} x1  -> n_baskets = 6
    rows = []
    parts = {"A": 1, "B": 2, "C": 3}
    baskets = [["A", "B"], ["A", "B"], ["A", "B"], ["A", "C"], ["B", "C"], ["A"]]
    for okey, items in enumerate(baskets):
        for it in items:
            rows.append((okey, parts[it]))
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    pt = spark.createDataFrame(
        [(v, f"Brand#{k}") for k, v in parts.items()], "p_partkey bigint, p_brand string"
    )
    got = {
        (r.antecedent, r.consequent): r
        for r in basket_rules(li, pt, min_pair_count=2, top_k=10).collect()
    }
    # only (A,B) passes min_pair_count=2: support 3/6, conf(A->B) 3/5,
    # conf(B->A) 3/4, lift(A->B) = (3/5)/(4/6), lift(B->A) = (3/4)/(5/6)
    assert set(got) == {("Brand#A", "Brand#B"), ("Brand#B", "Brand#A")}
    ab, ba = got[("Brand#A", "Brand#B")], got[("Brand#B", "Brand#A")]
    assert ab.support == ba.support == 3 / 6
    assert ab.confidence == 3 / 5 and ba.confidence == 3 / 4
    assert ab.lift == (3 / 5) / (4 / 6) and ba.lift == (3 / 4) / (5 / 6)
    # B->A has higher confidence -> rank 1
    assert ba.rk == 1 and ab.rk == 2


def test_basket_rules_mega_basket_cap(spark):
    from baum_welch_spark.operators.basket import basket_rules

    # one basket with 5 items, cap at 4 -> the basket is dropped entirely
    li = spark.createDataFrame(
        [(0, i) for i in range(5)] + [(1, 0), (1, 1)] * 3,
        "l_orderkey bigint, l_partkey bigint",
    )
    pt = spark.createDataFrame(
        [(i, f"Brand#{i}") for i in range(5)], "p_partkey bigint, p_brand string"
    )
    got = basket_rules(li, pt, min_pair_count=1, top_k=100, max_basket_items=4).collect()
    # only basket 1 survives: single pair (0,1), support 1/1
    assert {(r.antecedent, r.consequent) for r in got} == {
        ("Brand#0", "Brand#1"), ("Brand#1", "Brand#0")
    }
    assert all(r.support == 1.0 for r in got)


def test_cli_rules(spark, tmp_path):
    from baum_welch_spark.cli import main

    out = str(tmp_path / "rules")
    assert main(["rules", "-i", SF0001, "--min-count", "2", "-k", "5", "-o", out]) == 0
    got = spark.read.parquet(out)
    assert set(got.columns) == {
        "antecedent", "consequent", "pair_baskets", "support",
        "confidence", "lift", "rk",
    }
    assert 0 < got.count() <= 5


def test_basket_rules_empty_input(spark):
    from baum_welch_spark.operators.basket import basket_rules

    li = spark.createDataFrame([], "l_orderkey bigint, l_partkey bigint")
    pt = spark.createDataFrame([], "p_partkey bigint, p_brand string")
    assert basket_rules(li, pt).count() == 0


def test_basket_rules_matches_bruteforce_on_random_baskets(spark):
    """Randomized oracle: 60 seeded random baskets over 6 items; every rule
    basket_rules emits must equal the brute-force Python computation, and
    no qualifying rule may be missing (top_k set above the rule count)."""
    import itertools
    import random

    rng = random.Random(42)
    items = list(range(6))
    rows = []
    for okey in range(60):
        k = rng.randint(1, 4)
        for it in rng.sample(items, k):
            rows.append((okey, it))
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    pt = spark.createDataFrame(
        [(i, f"Brand#{i}") for i in items], "p_partkey bigint, p_brand string"
    )
    from baum_welch_spark.operators.basket import basket_rules

    min_pc = 3
    got = {
        (r.antecedent, r.consequent): r
        for r in basket_rules(li, pt, min_pair_count=min_pc, top_k=1000).collect()
    }
    # brute force
    baskets = {}
    for okey, it in rows:
        baskets.setdefault(okey, set()).add(f"Brand#{it}")
    n = len(baskets)
    item_cnt = {}
    pair_cnt = {}
    for s in baskets.values():
        for it in s:
            item_cnt[it] = item_cnt.get(it, 0) + 1
        for a, b in itertools.combinations(sorted(s), 2):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    expect = {}
    for (a, b), c in pair_cnt.items():
        if c < min_pc:
            continue
        for ante, cons in ((a, b), (b, a)):
            expect[(ante, cons)] = (
                c, c / n, c / item_cnt[ante], (c / item_cnt[ante]) / (item_cnt[cons] / n)
            )
    assert set(got) == set(expect)
    for key, (c, sup, conf, lift) in expect.items():
        r = got[key]
        assert (r.pair_baskets, r.support, r.confidence, r.lift) == (c, sup, conf, lift), key
