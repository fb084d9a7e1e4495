"""Operator-level tests: dedup/similarity/text/multimodal semantics plus
plan-audit assertions (the scale posture is part of the contract)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators import dedup, multimodal, relational, similarity, text
from baum_welch_spark.plans.audit import assert_plan, executed_plan_report, plan_report
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF0001, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF0001, "embeddings").cache()


def test_exact_dedup_finds_planted_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        schema="doc_id bigint, text string",
    )
    rows = {r.keep_doc_id: r.n_copies for r in dedup.exact_dedup(df).collect()}
    assert rows == {1: 3, 2: 1, 5: 1}


def test_jaccard_identical_docs_score_one(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, "completely different words entirely here now then")],
        schema="doc_id bigint, text string",
    )
    rows = dedup.neardup_jaccard(df, threshold=0.9).collect()
    assert len(rows) == 1 and rows[0].doc_a == 1 and rows[0].doc_b == 2
    assert rows[0].jaccard == 1.0


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """The operator's reason to exist: a short doc quoted verbatim inside a
    much longer one has Jaccard ≈ |A|/|B| (tiny) but containment C(A in B)
    = 1.0 — containment must flag the pair at a threshold where Jaccard
    does not."""
    quote = "to be or not to be that is the question we ask"
    filler = " ".join(f"filler{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote}"), (3, "unrelated text entirely here now")],
        schema="doc_id bigint, text string",
    )
    assert dedup.neardup_jaccard(df, threshold=0.5).count() == 0
    rows = dedup.neardup_containment(df, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.cont_a_in_b == 1.0  # every shingle of the quote is in doc 2
    assert r.cont_b_in_a < 0.1


def test_containment_symmetric_identical_docs(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, t), (2, t)], schema="doc_id bigint, text string"
    )
    r = dedup.neardup_containment(df, threshold=0.9).collect()[0]
    assert r.cont_a_in_b == 1.0 and r.cont_b_in_a == 1.0


def test_neardup_edit_planted_pairs_and_blocking(spark):
    base = "alpha " + " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " xx"),          # 3 edits, same first word, same bucket side
            (3, "beta " + base[6:]),    # small edit but FIRST WORD differs -> declared miss
            (4, base + " " + " ".join(f"pad{i}" for i in range(40))),  # > max_dist away
        ],
        schema="doc_id bigint, text string",
    )
    rows = {(r.doc_a, r.doc_b): r.dist for r in dedup.neardup_edit(df, max_dist=10).collect()}
    assert rows == {(1, 2): 3}


def test_neardup_edit_length_blocking_is_lossless_across_buckets(spark):
    """A qualifying pair whose lengths straddle a bucket boundary must
    survive the (b, b±1) probe: len 19 and len 21 land in buckets 0 and 1
    at width 20 and differ by 2 edits."""
    df = spark.createDataFrame(
        [(1, "w " + "a" * 17), (2, "w " + "a" * 19)],
        schema="doc_id bigint, text string",
    )
    rows = dedup.neardup_edit(df, max_dist=20).collect()
    assert len(rows) == 1 and rows[0].dist == 2


def test_jaccard_hot_shingle_cap(spark):
    """A boilerplate shingle shared by k docs must NOT generate its k^2/2
    pairs when k exceeds max_doc_freq (VERDICT r1 "What's wrong" #4): the
    pair array a hot shingle materializes in one row is bounded by the cap.
    """
    boiler = "all rights reserved"
    # 40 docs share ONLY the boilerplate trigram; unique tails keep them
    # dissimilar otherwise
    docs = [(i, f"{boiler} unique{i} tail{i} words{i}") for i in range(40)]
    df = spark.createDataFrame(docs, schema="doc_id bigint, text string")
    # cap below k: the hot shingle is dropped, no pair survives
    assert dedup.neardup_jaccard(df, threshold=0.01, max_doc_freq=10).count() == 0
    # cap above k: the 40*39/2 boilerplate pairs appear (jaccard 1/7 each)
    assert dedup.neardup_jaccard(df, threshold=0.01, max_doc_freq=100).count() == 40 * 39 // 2


def test_connected_components_raises_on_nonconvergence(spark):
    """A duplicate chain deeper than the rounds can reach must fail loudly,
    not return a split cluster (ADVICE r1). With pointer jumping the reach
    after r rounds is ~2^r - 1 hops, so a 100-chain needs ~8 rounds."""
    chain = [(i, i + 1) for i in range(100)]
    pairs = spark.createDataFrame(chain, schema="doc_a bigint, doc_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=3)
    # and enough rounds converges to one component in O(log diameter)
    comp = dedup.connected_components(pairs, max_iter=12)
    assert comp.select("component").distinct().count() == 1


def test_connected_components_preserves_caller_cache(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], schema="doc_a bigint, doc_b bigint"
    ).persist()
    try:
        dedup.connected_components(pairs).collect()
        assert pairs.storageLevel.useMemory, "caller's cache was evicted"
    finally:
        pairs.unpersist()


def test_minhash_shuffle_regime_matches_broadcast_regime(spark, documents):
    """The verify joins no longer force a broadcast; with broadcasting
    disabled entirely (candidate-explosion regime) the output is identical
    (VERDICT r1 item 8)."""
    base = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(documents, verify_threshold=0.4).collect()
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.minhash_lsh_pairs(documents, verify_threshold=0.4).collect()
        }
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert shuffled == base


def test_minhash_candidates_superset_of_high_jaccard(spark, documents):
    """LSH with these band parameters must recover every pair the exact
    join scores >= 0.4 (high-similarity recall check)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup.neardup_jaccard(documents, threshold=0.4).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(documents, verify_threshold=0.4).collect()
    }
    assert exact <= lsh | exact  # lsh may miss some (approx), but...
    recall = len(exact & lsh) / max(len(exact), 1)
    assert recall >= 0.8, f"LSH recall {recall} over {len(exact)} pairs"


def test_simhash_pairs_symmetric_bounds(spark, documents):
    rows = dedup.simhash_pairs(documents, max_hamming=8).collect()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 8


def test_knn_brute_matches_numpy(spark, embeddings):
    got = similarity.knn_brute(embeddings, n_queries=3, k=4).collect()
    pdf = embeddings.toPandas().set_index("vec_id")["embedding"]
    M = np.vstack([np.array(v, dtype=np.float64) for v in pdf])
    ids = np.array(pdf.index)
    unit = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = unit @ unit.T
    for q in range(3):
        qi = int(np.where(ids == q)[0][0])
        cand = [(round(sims[qi, j], 6), int(ids[j])) for j in range(len(ids)) if ids[j] >= 3]
        cand.sort(key=lambda x: (-x[0], x[1]))
        expect = [c_id for _, c_id in cand[:4]]
        mine = [r.c_id for r in sorted(got, key=lambda r: r.rk) if r.q_id == q]
        assert mine == expect, f"query {q}"


def test_knn_ivf_recall_vs_brute(spark, embeddings):
    brute = {(r.q_id, r.c_id) for r in similarity.knn_brute(embeddings, n_queries=5, k=5).collect()}
    ivf = {(r.q_id, r.c_id) for r in similarity.knn_ivf(embeddings, n_queries=5, k=5).collect()}
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.3, f"IVF recall {recall}"  # approximate by design


def test_lang_id_deterministic_and_total(spark, documents):
    rows = text.lang_id(documents).collect()
    assert len(rows) == documents.count()
    assert all(r.pred_lang in text.LANG_MARKERS for r in rows)


def test_multimodal_feature_extraction(spark):
    assets = multimodal.synthetic_assets(spark, n=24)
    feats = multimodal.extract_features(assets).collect()
    assert len(feats) == 24
    for r in feats:
        assert len(r.feature) == 8
        assert all(0.0 <= x < 1.0 for x in r.feature)
        assert len(r.sha256) == 64
    # determinism: same payload -> same feature
    again = {r.asset_id: r.feature for r in multimodal.extract_features(assets).collect()}
    for r in feats:
        assert again[r.asset_id] == r.feature


def test_multimodal_real_decode_stubbed_only_for_absent_codecs(spark):
    """Compressed formats (mp4) still hit the declared stub; WAV/PPM/Y4M
    decode for real (r12: every synthetic modality has a real codec)."""
    assets = multimodal.synthetic_assets(spark, n=9)
    rows = multimodal.extract_features(assets, decode_stub=False).collect()
    assert len(rows) == 9 and all(len(r.feature) == 8 for r in rows)
    mp4 = spark.createDataFrame(
        [(0, "video", b"\x00\x01\x02ftypisom", {"mime": "video/mp4", "width": 64, "height": 64, "duration_ms": 1000})],
        schema=multimodal.ASSET_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.extract_features(mp4, decode_stub=False).collect()


def test_y4m_roundtrip_and_boundaries():
    """encode_y4m -> decode_y4m preserves frame count/shape/fps and luma to
    within the YCbCr round-trip's rounding; unsupported colorspaces and
    truncated streams raise at the point of use."""
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (5, 16, 12, 3), dtype=np.uint8)
    payload = multimodal.encode_y4m(frames, fps=4)
    assert payload.startswith(b"YUV4MPEG2 W12 H16 F4:1")
    back, fps = multimodal.decode_y4m(payload)
    assert back.shape == frames.shape and fps == 4
    # YCbCr<->RGB round-trip is lossy by ±~2 per channel, mean luma stable
    luma = lambda f: (0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]).mean()
    for a, b in zip(frames, back):
        assert abs(luma(a.astype(float)) - luma(b.astype(float))) < 1.5
    # C420jpeg: synthesize planar 420 directly (half-res chroma)
    h, w = 4, 4
    y = np.full(h * w, 90, np.uint8).tobytes()
    c = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    p420 = b"YUV4MPEG2 W4 H4 F25:1\n" + b"FRAME\n" + y + c + c
    f420, fps420 = multimodal.decode_y4m(p420)
    assert f420.shape == (1, 4, 4, 3) and fps420 == 25
    assert int(f420[0, 0, 0, 0]) == 90  # neutral chroma -> gray at Y
    with pytest.raises(NotImplementedError, match="colorspace"):
        multimodal.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C422\n" + b"FRAME\n" + y * 2)
    with pytest.raises(ValueError, match="truncated|FRAME|no frames"):
        multimodal.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + y)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        multimodal.decode_y4m(b"RIFFxxxx")


def test_video_planted_neardup_through_real_y4m_path(spark):
    """The r12 closeout check: a planted video near-dup pair must be found
    through the REAL Y4M decode (temporal-luma features), not a digest
    stub — and byte-UNequal payloads must still pair (the stub could only
    match identical bytes)."""
    assets = multimodal.synthetic_assets(spark, n=30, seed=42)
    vids = assets.filter(F.col("modality") == "video")
    rows = {r.asset_id: bytes(r.payload) for r in vids.collect()}
    assert rows[29] != rows[20]  # fresh noise: the dup is NOT a byte copy
    pairs = {
        (r.asset_a, r.asset_b)
        for r in multimodal.neardup_assets_by_feature(
            vids, threshold=0.995, decode_stub=False
        ).collect()
    }
    assert (20, 29) in pairs


def test_wav_codec_roundtrip():
    t = np.arange(800) / 8000.0
    samples = 0.25 * np.sin(2 * np.pi * 440 * t)
    decoded, rate = multimodal.decode_wav(multimodal.encode_wav(samples, rate=8000))
    assert rate == 8000 and len(decoded) == 800
    assert np.allclose(decoded, samples, atol=1.0 / 32767)


def test_ppm_codec_roundtrip_and_header_comments():
    px = ((np.arange(16 * 16 * 3).reshape(16, 16, 3) * 3) % 256).astype(np.uint8)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(px)), px)
    # netpbm headers may carry comments and arbitrary whitespace
    with_comment = b"P6 # a comment\n# another\n 16\t16 \n255\n" + px.tobytes()
    assert np.array_equal(multimodal.decode_ppm(with_comment), px)


def test_real_decode_feature_neardup_path(spark):
    """End-to-end REAL path: encode WAVs -> decode -> band-RMS features ->
    cosine near-dup. Two near-identical tones pair up; a different tone
    with a distinct envelope does not."""
    t = np.arange(1600) / 8000.0
    base = 0.5 * np.sin(2 * np.pi * 300 * t)
    # same tone + tiny noise = near-dup; ramped-envelope tone = different bands
    variant = base + 0.002 * np.sin(2 * np.pi * 50 * t)
    other = np.linspace(0, 1, 1600) * np.sin(2 * np.pi * 300 * t)
    rows = [
        (i, "audio", multimodal.encode_wav(s), {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 200})
        for i, s in enumerate([base, variant, other])
    ]
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    pairs = {
        (r.asset_a, r.asset_b)
        for r in multimodal.neardup_assets_by_feature(
            assets, threshold=0.999, decode_stub=False
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs and (1, 2) not in pairs


def test_neardup_feature_cache_is_bounded_and_releasable(spark):
    """ADVICE-r9: neardup_assets_by_feature persisted its feature frame on
    every call and never unpersisted — executor cache grew per call for
    the session lifetime. Now each call releases the previous call's
    frame (at most ONE live cached frame) and release_feature_cache()
    frees the last one on demand."""
    t = np.arange(800) / 8000.0
    rows = [
        (i, "audio", multimodal.encode_wav(0.1 * (i + 1) * np.sin(2 * np.pi * 300 * t)),
         {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 100})
        for i in range(3)
    ]
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    for strategy in ("exact", "blocked", "exact"):
        multimodal.neardup_assets_by_feature(
            assets, threshold=0.999, decode_stub=False, pair_strategy=strategy
        ).collect()
        assert len(multimodal._FEAT_CACHE) == 1
        assert multimodal._FEAT_CACHE[0].storageLevel.useMemory
    multimodal.release_feature_cache()
    assert not multimodal._FEAT_CACHE


def test_multimodal_frame_plan_and_dedup(spark):
    assets = multimodal.synthetic_assets(spark, n=12)
    frames = multimodal.frame_sample_plan(assets, every_ms=500).collect()
    assert all(r.frame_ms % 500 == 0 for r in frames)
    d = multimodal.dedup_assets_exact(assets).collect()
    assert sum(r.n_copies for r in d) == 12


# -- plan audits (scale posture, SURVEY §4) --------------------------------


def test_q1_plan_pushdown_and_partial_agg(spark):
    li = load_table(spark, SF0001, "lineitem")
    rep = assert_plan(relational.q1_pricing_summary(li), max_shuffles=3, require_pushdown=True)
    assert rep["python_stages"] == 0
    rep = executed_plan_report(relational.q1_pricing_summary(li))
    assert rep["wholestage_codegen"]


def test_q5_plan_broadcasts_dims(spark):
    dfs = [load_table(spark, SF0001, t) for t in ("customer", "orders", "lineitem", "nation", "region")]
    rep = assert_plan(relational.q5_region_revenue(*dfs), require_broadcast=True)
    assert rep["sortmerge_joins"] <= 1  # only the two fact tables may SMJ


def test_knn_plan_broadcasts_queries_no_shuffle_on_corpus(spark, embeddings):
    rep = plan_report(similarity.knn_brute(embeddings))
    assert rep["broadcast_joins"] >= 1
    assert rep["python_stages"] == 0  # pure Catalyst vector math


def test_doc_quality_plan_stays_codegen(spark, documents):
    rep = plan_report(text.doc_quality(documents))
    assert rep["python_stages"] == 0
    assert rep["shuffles"] == 0  # narrow projection only


def test_cosine_neardup_matches_numpy(spark, embeddings):
    got = {(r.vec_a, r.vec_b): r.cos for r in similarity.cosine_neardup(embeddings).collect()}
    pdf = embeddings.toPandas().set_index("vec_id")["embedding"]
    M = np.vstack([np.array(v, dtype=np.float64) for v in pdf])
    ids = list(pdf.index)
    unit = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = unit @ unit.T
    expect = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and round(sims[i, j], 6) >= 0.35:
                expect[(ids[i], ids[j])] = round(sims[i, j], 6)
    assert got.keys() == expect.keys()
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9


def test_cosine_neardup_lsh_subset_and_recall(spark, embeddings):
    """LSH output must be a strict subset of the exact pairs (candidates are
    verified exactly) with recall >= 0.6 at the default (bits=4, tables=8)."""
    exact = {(r.vec_a, r.vec_b) for r in similarity.cosine_neardup(embeddings).collect()}
    lsh = {(r.vec_a, r.vec_b) for r in similarity.cosine_neardup_lsh(embeddings).collect()}
    assert lsh <= exact
    recall = len(lsh & exact) / max(len(exact), 1)
    assert recall >= 0.6, f"LSH recall {recall} over {len(exact)} exact pairs"


def test_cosine_neardup_lsh_plan_id_only_candidates(spark, embeddings):
    """Scale shape: the candidate self-join must broadcast-verify against the
    vector table (2 broadcast joins) and contain no nested-loop join; the
    exact verify is ONE Arrow-batched kernel (the Catalyst fold was ~10x
    slower per candidate), never a row-at-a-time UDF."""
    rep = plan_report(similarity.cosine_neardup_lsh(embeddings))
    assert rep["nested_loop_joins"] == 0, rep
    assert rep["broadcast_joins"] >= 2, rep
    assert rep["python_stages"] == 1, rep


def test_q4_plan_is_semi_join(spark):
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    df = relational.q4_late_orders(orders, lineitem)
    tree_rep = plan_report(df)
    assert tree_rep["nested_loop_joins"] == 0
    from baum_welch_spark.plans.audit import explain_str

    assert "LeftSemi" in explain_str(df, "simple")
    # correctness vs per-order python check at sf0.001
    got = {r.o_orderpriority: r.order_count for r in df.collect()}
    li = {}
    for r in lineitem.select("l_orderkey", "l_shipdate").collect():
        li.setdefault(r.l_orderkey, []).append(r.l_shipdate)
    import datetime as dt

    expect = {}
    for r in orders.select("o_orderkey", "o_orderdate", "o_orderpriority").collect():
        if any(s > r.o_orderdate + dt.timedelta(days=30) for s in li.get(r.o_orderkey, [])):
            expect[r.o_orderpriority] = expect.get(r.o_orderpriority, 0) + 1
    assert got == expect


def test_customers_without_orders_anti_semantics(spark):
    from baum_welch_spark.plans.audit import explain_str

    cust = spark.createDataFrame(
        [(1, "a", "S1"), (2, "b", "S2"), (3, "c", "S1")],
        schema="c_custkey bigint, c_name string, c_mktsegment string",
    )
    orders = spark.createDataFrame([(10, 1), (11, 1), (12, 3)], schema="o_orderkey bigint, o_custkey bigint")
    got = relational.customers_without_orders(cust, orders).collect()
    assert [r.c_custkey for r in got] == [2]
    df = relational.customers_without_orders(cust, orders)
    assert "LeftAnti" in explain_str(df, "simple")


def test_repeat_buyer_days_disjoint_from_viewers_without_purchase(spark):
    ev = load_table(spark, SF0001, "events")
    both = {(r.user_id, r.day) for r in relational.repeat_buyer_days(ev).collect()}
    only_view = {(r.user_id, r.day) for r in relational.viewers_without_purchase(ev).collect()}
    assert both and only_view
    assert not (both & only_view)  # INTERSECT and EXCEPT partition the viewer-days


def test_connected_components_matches_union_find(spark, documents):
    pairs = dedup.neardup_jaccard(documents, threshold=0.3)
    rows = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    got = {r.node: r.component for r in dedup.connected_components(pairs).collect()}
    # python union-find oracle
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in rows:
        union(a, b)
    expect = {x: find(x) for x in parent}
    assert got == expect and len(got) > 0


def test_dedup_clusters_cover_all_paired_docs(spark, documents):
    pairs = dedup.neardup_jaccard(documents, threshold=0.3)
    n_nodes = pairs.select(F.col("doc_a").alias("d")).unionByName(
        pairs.select(F.col("doc_b").alias("d"))
    ).distinct().count()
    clusters = dedup.dedup_clusters_jaccard(documents, threshold=0.3).collect()
    assert sum(r.n_docs for r in clusters) == n_nodes
    assert all(r.n_docs >= 2 for r in clusters)  # singletons never form edges


def test_synthetic_corpus_plants_linear_neardups_and_strategies_agree(spark):
    """The r9 synthetic corpus contract: every i % 10 == 9 asset is a
    near-dup of asset i-9 (same modality), independent profiles stay under
    the 0.995 bar, and the blocked-GEMM pair strategy returns exactly the
    all-pairs result (both are exact; only the physical plan differs)."""
    assets = multimodal.synthetic_assets(spark, n=120, seed=42).persist()
    planted = {(i - 9, i) for i in range(9, 120) if i % 10 == 9}
    got = {}
    for m, stub in (("image", False), ("audio", False), ("video", False)):
        sub = assets.filter(F.col("modality") == m)
        for strat in ("exact", "blocked"):
            got[(m, strat)] = {
                (r.asset_a, r.asset_b)
                for r in multimodal.neardup_assets_by_feature(
                    sub, threshold=0.995, decode_stub=stub, pair_strategy=strat
                ).collect()
            }
        assert got[(m, "exact")] == got[(m, "blocked")]
    found = set().union(*got.values())
    assert planted <= found  # 100% planted recall
    # independent profiles: at n=120 (~2000 cross pairs/modality, tail
    # ~1e-5) any spurious mass means the profile spread regressed
    assert len(found - planted) <= 2


def test_neardup_strategies_agree_on_zero_norm_features(spark):
    """Byte-identical SILENT assets (all-zero band-RMS features) must pair
    at cos 1.0 under every pair strategy: the blocked/LSH delegates drop
    zero-norm rows, so the wrapper splits them out and pairs them directly
    (review finding, r9)."""
    silent = multimodal.encode_wav(np.zeros(1600))
    tone = multimodal.encode_wav(0.3 * np.sin(2 * np.pi * 300 * np.arange(1600) / 8000.0))
    rows = [
        (i, "audio", p, {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 200})
        for i, p in enumerate([silent, silent, tone])
    ]
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    for strat in ("exact", "blocked", "lsh"):
        pairs = {
            (r.asset_a, r.asset_b): r.cos
            for r in multimodal.neardup_assets_by_feature(
                assets, threshold=0.995, decode_stub=False, pair_strategy=strat
            ).collect()
        }
        assert pairs == {(0, 1): 1.0}, strat


def test_multimodal_neardup_finds_planted_payload_dups(spark):
    """Identical payloads -> identical stub features -> cos == 1.0 pairs."""
    assets = multimodal.synthetic_assets(spark, n=16)
    two = assets.limit(2).collect()
    import pyspark.sql.functions as SF

    dup = assets.unionByName(
        spark.createDataFrame(
            [(100 + r.asset_id, r.modality, r.payload, r.meta) for r in two],
            schema=assets.schema,
        )
    )
    pairs = {(r.asset_a, r.asset_b): r.cos for r in multimodal.neardup_assets_by_feature(dup).collect()}
    for r in two:
        assert pairs.get((r.asset_id, 100 + r.asset_id)) == 1.0


def test_bpe_token_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! 42 tokens"), (2, "a b")], schema="doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in text.bpe_token_stats(df).collect()}
    # Hello , world ! 4 2 tokens -> 7 bpe; 4 ws
    assert rows[1].n_bpe_tokens == 7 and rows[1].n_ws_tokens == 4
    assert rows[2].n_bpe_tokens == 2 and rows[2].fertility == 1.0


def test_multimodal_edge_cases(spark):
    """Review-found edges: null/negative video duration must not vanish or
    crash the frame plan; zero-norm feature pairs get defined cosine; a
    truncated PPM header raises a clear parse error."""
    import pytest as _pytest

    rows = [
        (1, "video", b"v1", {"mime": "video/mp4", "width": None, "height": None, "duration_ms": 500}),
        (2, "video", b"v2", {"mime": "video/mp4", "width": None, "height": None, "duration_ms": None}),
        (3, "video", b"v3", {"mime": "video/mp4", "width": None, "height": None, "duration_ms": -7}),
    ]
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    frames = multimodal.frame_sample_plan(assets, every_ms=250).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r.frame_ms)
    assert sorted(by_asset[1]) == [0, 250, 500]
    assert by_asset[2] == [None] and by_asset[3] == [None]  # visible, not dropped

    # zero-norm pair: two silent WAVs are byte-identical -> cos 1.0, not NULL
    silent = np.zeros(1600)
    tone = 0.5 * np.sin(2 * np.pi * 300 * (np.arange(1600) / 8000.0))
    arows = [
        (i, "audio", multimodal.encode_wav(s), {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 200})
        for i, s in enumerate([silent, silent, tone])
    ]
    a = spark.createDataFrame(arows, schema=multimodal.ASSET_SCHEMA)
    pairs = {
        (r.asset_a, r.asset_b): r.cos
        for r in multimodal.neardup_assets_by_feature(a, threshold=0.9, decode_stub=False).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert (0, 2) not in pairs and (1, 2) not in pairs

    with _pytest.raises(ValueError, match="truncated PPM header"):
        multimodal.decode_ppm(b"P6\n16 16")


def test_global_rank_matches_window_rank(spark):
    """global_rank (range-partition + offset two-phase rank) must reproduce
    rank()/percent_rank() over an unpartitioned window exactly — the sort
    key is unique, so row_number == rank and pct == (rk-1)/(N-1)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.relational import global_rank

    # values with heavy ties on `v` (tiebreaker `k` makes the key unique),
    # spread over many input partitions
    df = (
        spark.range(0, 997, 1, 13)
        .select(F.col("id").alias("k"), (F.col("id") % 7).cast("double").alias("v"))
    )
    got = (
        global_rank(df, [F.desc("v"), F.asc("k")], rank_col="rk", pct_col="pct")
        .orderBy("k")
        .collect()
    )
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = (
        df.withColumn("rk", F.rank().over(w))
        .withColumn("pct", F.percent_rank().over(w))
        .orderBy("k")
        .collect()
    )
    assert [(r["k"], r["rk"]) for r in got] == [(r["k"], r["rk"]) for r in want]
    assert all(abs(g["pct"] - x["pct"]) < 1e-12 for g, x in zip(got, want))


def test_global_rank_lazy_composition_of_two_calls(spark):
    """Two global_rank results built BEFORE either is consumed must both be
    correct: materialization is call-scoped (eager localCheckpoint), so a
    later call can't invalidate an earlier, still-lazy result the way a
    shared single-slot cache could."""
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.relational import global_rank

    df = spark.range(0, 500, 1, 11).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("double").alias("v")
    )
    a = global_rank(df, [F.desc("v"), F.asc("k")], rank_col="rk")
    b = global_rank(df.where(F.col("k") % 2 == 0), [F.asc("v"), F.asc("k")], rank_col="rk")
    # consume in reverse issue order, then the first again
    got_b = {r["k"]: r["rk"] for r in b.collect()}
    got_a = {r["k"]: r["rk"] for r in a.collect()}
    got_a2 = {r["k"]: r["rk"] for r in a.collect()}
    assert got_a == got_a2
    assert sorted(got_a.values()) == list(range(1, 501))
    assert sorted(got_b.values()) == list(range(1, 251))
    # spot-check ordering semantics on a: rank 1 is the max-v, min-k row
    top = min(got_a, key=lambda k: got_a[k])
    assert top == 4  # v = 4.0 (max), smallest k with that v


def test_global_rank_single_row_pct_zero(spark):
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.relational import global_rank

    df = spark.createDataFrame([(1, 5.0)], "k long, v double")
    row = global_rank(df, [F.desc("v"), F.asc("k")], rank_col="rk", pct_col="pct").first()
    assert row["rk"] == 1 and row["pct"] == 0.0


def test_cosine_lsh_hot_bucket_cap_bounds_pairs(spark):
    """Degenerate embeddings (identical vectors) collapse into one bucket
    per table; with max_bucket below the group size the operator must emit
    no candidate pairs from the hot bucket instead of k^2/2 of them."""
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.similarity import cosine_neardup_lsh

    rows = [(i, [1.0] * 8 if i < 50 else [float(i % 7 - 3), 1.0] + [0.0] * 6, 0) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    capped = cosine_neardup_lsh(df, threshold=0.9, max_bucket=10)
    # the 50 identical vectors exceed every per-bucket cap of 10 -> dropped
    pairs = {(r["vec_a"], r["vec_b"]) for r in capped.collect()}
    assert not any(a < 50 and b < 50 for a, b in pairs)
    # uncapped finds the identical-vector clique
    full = cosine_neardup_lsh(df, threshold=0.9)
    assert full.where((F.col("vec_a") < 50) & (F.col("vec_b") < 50)).count() == 50 * 49 // 2


def test_cohort_retention_semantics(spark):
    """Hand-checkable cohort matrix: offsets measured from each user's
    first-activity week; offset-0 count equals cohort size."""
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.relational import cohort_retention

    rows = [
        # user 1: weeks 0 and 1 ; user 2: week 0 only ; user 3: weeks 1 and 3
        (1, "2024-01-01 10:00:00", 1), (2, "2024-01-10 10:00:00", 1),
        (3, "2024-01-02 10:00:00", 2),
        (4, "2024-01-08 10:00:00", 3), (5, "2024-01-22 10:00:00", 3),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (str(r["cohort_week"])[:10], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    # cohort of 2024-01-01 (Mon): users 1,2 at offset 0; user 1 back at offset 1
    # cohort of 2024-01-08 (Mon): user 3 at offset 0, back at offset 2
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 2): 1,
    }


def test_rolling_user_spend_range_frame_semantics(spark):
    """RANGE frame includes exactly purchases within the trailing 24h
    (inclusive), per user."""
    from pyspark.sql import functions as F

    from baum_welch_spark.operators.relational import rolling_user_spend

    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),
        (2, "2024-01-01 12:00:00", 1, 20.0),   # within 24h of #1
        (3, "2024-01-02 00:00:00", 1, 30.0),   # exactly 24h after #1 -> included
        (4, "2024-01-03 00:00:01", 1, 40.0),   # everything else out of range
        (5, "2024-01-01 06:00:00", 2, 5.0),    # other user, independent
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "purchase", v, "{}") for i, ts, u, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: (r["n_24h"], r["spend_24h"]) for r in rolling_user_spend(df).collect()}
    assert got == {
        1: (1, 10.0),
        2: (2, 30.0),
        3: (3, 60.0),
        4: (1, 40.0),
        5: (1, 5.0),
    }


def test_q10_plan_broadcasts_nation_and_pushes_filters(spark):
    dfs = [load_table(spark, SF0001, t) for t in ("customer", "orders", "lineitem", "nation")]
    rep = assert_plan(
        relational.q10_returned_revenue(*dfs), require_broadcast=True, require_pushdown=True
    )
    assert rep["python_stages"] == 0


def test_q14_q19_plans_push_filters_stay_codegen(spark):
    li = load_table(spark, SF0001, "lineitem")
    part = load_table(spark, SF0001, "part")
    rep = assert_plan(relational.q14_promo_share(li, part), require_pushdown=True, max_shuffles=3)
    assert rep["python_stages"] == 0
    # q19: the OR of the three quantity ranges must still reach the scan
    rep = assert_plan(relational.q19_bracket_revenue(li, part), require_pushdown=True)
    assert rep["python_stages"] == 0


def test_merge_upsert_plan_single_join_no_python(spark):
    from baum_welch_spark.operators.merge import merge_upsert

    orders = load_table(spark, SF0001, "orders")
    rep = plan_report(merge_upsert(orders))
    assert rep["python_stages"] == 0
    # exactly one BroadcastNestedLoopJoin is expected: the 1-row
    # max(o_orderkey) frame that derives collision-free insert keys
    # (ADVICE r5) cross-joins in as a broadcast, the graph.py dangling-mass
    # pattern; anything more would be a real nested loop
    assert rep["nested_loop_joins"] <= 1
    assert rep["sortmerge_joins"] + rep["broadcast_joins"] >= 1


def test_resize_images_nearest_neighbor(spark):
    import numpy as np

    from baum_welch_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_images,
        resize_ppm,
        synthetic_assets,
    )

    # planted 4x4 -> 2x2: nearest-neighbor picks pixel centers (rows 1,3)
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_ppm(px, 2, 2)
    assert small.shape == (2, 2, 3)
    np.testing.assert_array_equal(small, px[[1, 3]][:, [1, 3]])

    assets = synthetic_assets(spark, n=24)
    out = resize_images(assets, out_h=4, out_w=4).collect()
    n_images = assets.filter("modality = 'image'").count()
    assert len(out) == n_images and n_images > 0
    for r in out:
        assert (r.width, r.height) == (4, 4)
        assert decode_ppm(bytes(r.payload)).shape == (4, 4, 3)


def test_new_tpch_faces_plans(spark):
    # r6 faces: date/type/brand filters must reach the scans, constant-size
    # dims must broadcast, and nothing drops into Python.
    li = load_table(spark, SF0001, "lineitem")
    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    supplier = load_table(spark, SF0001, "supplier")
    nation = load_table(spark, SF0001, "nation")
    part = load_table(spark, SF0001, "part")
    region = load_table(spark, SF0001, "region")

    rep = assert_plan(
        relational.q7_volume_shipping(li, orders, customer, supplier, nation),
        require_broadcast=True,
        require_pushdown=True,
    )
    assert rep["python_stages"] == 0
    rep = assert_plan(
        relational.q8_market_share(li, orders, customer, supplier, part, nation, region),
        require_broadcast=True,
        require_pushdown=True,
    )
    assert rep["python_stages"] == 0
    # q13: two partial-agg shuffles + the customer|><|orders join only
    rep = assert_plan(relational.q13_customer_distribution(customer, orders), max_shuffles=4)
    assert rep["python_stages"] == 0
    rep = assert_plan(
        relational.q17_small_quantity_revenue(li, part),
        require_broadcast=True,
        require_pushdown=True,
    )
    assert rep["python_stages"] == 0
    rep = assert_plan(relational.q18_large_volume_customers(customer, orders, li))
    assert rep["python_stages"] == 0 and rep["nested_loop_joins"] == 0
    rep = assert_plan(
        relational.q22_dormant_customers(customer, orders), require_pushdown=True
    )
    assert rep["python_stages"] == 0


def test_q18_threshold_semantics(spark):
    # every returned order's sum_qty must exceed the threshold, and the
    # top-20 ordering must be (o_totalprice desc, o_orderkey asc)
    li = load_table(spark, SF0001, "lineitem")
    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    rows = relational.q18_large_volume_customers(customer, orders, li, min_qty=300).collect()
    assert 0 < len(rows) <= 20
    assert all(r.sum_qty > 300 for r in rows)
    keys = [(-r.o_totalprice, r.o_orderkey) for r in rows]
    assert keys == sorted(keys)


def test_q22_dormant_excludes_recent_buyers(spark):
    from pyspark.sql import functions as FF

    orders = load_table(spark, SF0001, "orders")
    customer = load_table(spark, SF0001, "customer")
    out = relational.q22_dormant_customers(customer, orders, since="2000-01-01")
    got = {r.c_mktsegment: (r.numcust, r.totacctbal) for r in out.collect()}
    assert got, "face must be non-vacuous on the fixture"
    # oracle-independent invariant: no counted customer ordered after cutoff
    recent = {
        r.o_custkey
        for r in orders.filter(FF.col("o_orderdate") >= "2000-01-01").select("o_custkey").collect()
    }
    avg_bal = customer.filter(FF.col("c_acctbal") > 0).agg(FF.avg("c_acctbal")).first()[0]
    manual = {}
    for r in customer.collect():
        if r.c_acctbal > avg_bal and r.c_custkey not in recent:
            n, s = manual.get(r.c_mktsegment, (0, 0.0))
            manual[r.c_mktsegment] = (n + 1, s + round(r.c_acctbal * 100) / 100.0)
    assert set(got) == set(manual)
    for seg, (n, s) in manual.items():
        assert got[seg][0] == n
        assert abs(got[seg][1] - s) < 1e-6


def test_time_bucket_interpolate_linearity(spark):
    # planted gap: hours 0 and 3 observed, 1 and 2 must sit on the line
    events = spark.createDataFrame(
        [
            (1, 100, "a", "2024-01-01 00:30:00", 10.0),
            (2, 100, "a", "2024-01-01 03:30:00", 40.0),
        ],
        schema="event_id bigint, user_id bigint, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r.bucket: r for r in relational.time_bucket_interpolate(events).collect()}
    assert len(rows) == 4
    assert rows["2024-01-01 00:00:00"].value == 10.0 and rows["2024-01-01 00:00:00"].observed
    assert not rows["2024-01-01 01:00:00"].observed
    assert abs(rows["2024-01-01 01:00:00"].value - 20.0) < 1e-9
    assert abs(rows["2024-01-01 02:00:00"].value - 30.0) < 1e-9
    assert rows["2024-01-01 03:00:00"].value == 40.0


def test_lineitem_stats_one_pass_and_values(spark):
    li = load_table(spark, SF0001, "lineitem")
    rep = plan_report(relational.lineitem_stats(li))
    assert rep["python_stages"] == 0
    assert rep["scans"] == 1  # one pass: Expand handles the multi-distinct
    rows = {r.col_name: r for r in relational.lineitem_stats(li).collect()}
    assert set(rows) == {"l_quantity", "l_extendedprice", "l_discount"}
    n = li.count()
    pdf = li.select("l_quantity").toPandas()["l_quantity"]
    r = rows["l_quantity"]
    assert r.n_rows == n and r.n_nulls == 0
    assert r.min_val == pdf.min() and r.max_val == pdf.max()
    assert r.ndv == pdf.nunique()


def test_neardup_edit_plan_no_cartesian(spark, documents):
    """The blocked self-join must be an equi-join on the block key (never a
    cartesian/nested-loop), with the levenshtein filter applied after."""
    rep = plan_report(dedup.neardup_edit(documents))
    assert rep["nested_loop_joins"] == 0, rep
    assert rep["python_stages"] == 0, rep


def test_copy_pairs_single_shuffle_before_agg(spark, documents):
    """Pair generation is the grouped-list explode: one fingerprint shuffle
    plus the pair-count agg — no self-join's second exchange."""
    from baum_welch_spark.operators import text

    rep = plan_report(text.copy_pairs(documents))
    # fp groupBy + (doc_a, doc_b) agg + final sort = 3 exchanges, plus the
    # conditional _spread_for_extraction repartition (raw-doc bytes, fires
    # on few-file scans like this fixture) = 4 max
    assert int(rep["shuffles"]) <= 4, rep
    assert rep["python_stages"] == 0, rep


def test_png_codec_roundtrip_and_all_filters():
    """encode_png -> decode_png is exact; decode handles every scanline
    filter (a hand-filtered IDAT exercises Sub/Up/Average/Paeth), gray and
    RGBA color types, and rejects unsupported shapes at the honest codec
    boundary."""
    import struct
    import zlib

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_png(multimodal.encode_png(px)), px)

    # hand-build a PNG whose scanlines use filters 1..4 (encoder only emits 0)
    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data) & 0xFFFFFFFF
        )

    h, w, ch = 5, 4, 3
    img = rng.integers(0, 256, (h, w * ch), dtype=np.uint8).astype(np.int64)
    lines = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y, f in zip(range(h), [0, 1, 2, 3, 4]):
        cur = img[y]
        filt = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: multimodal._paeth(a, b, c)}[f]
            filt[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    payload = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(
        multimodal.decode_png(payload), img.astype(np.uint8).reshape(h, w, ch)
    )

    # gray (type 0) broadcasts, RGBA (type 6) drops alpha
    gray = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    g_payload = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(b"\x00" + gray[y].tobytes() for y in range(4))))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(g_payload), np.repeat(gray[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    a_payload = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(multimodal.decode_png(a_payload), rgba[:, :, :3])
    with pytest.raises(NotImplementedError, match="16-bit"):
        multimodal.decode_png(
            multimodal._PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        )


def test_png_planted_duplicate_neardup(spark):
    """VERDICT-r7 #7: the REAL PNG path end-to-end — encode planted
    near-duplicate images as PNG, decode through extract_features
    (decode_stub=False), and the near-dup pair (tiny pixel perturbation)
    surfaces while a structurally different image does not."""
    rng = np.random.default_rng(11)
    # VERTICAL gradient: band-luminance features ramp 0 -> 255 down the rows
    base = (np.linspace(0, 255, 16)[:, None, None] * np.ones((1, 16, 3))).astype(np.uint8)
    variant = np.clip(base.astype(np.int64) + rng.integers(-2, 3, base.shape), 0, 255).astype(np.uint8)
    other = base[::-1].copy()  # inverted ramp: opposite band profile
    rows = [
        (i, "image", multimodal.encode_png(p),
         {"mime": "image/png", "width": 16, "height": 16, "duration_ms": None})
        for i, p in enumerate([base, variant, other])
    ]
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)
    pairs = {
        (r.asset_a, r.asset_b)
        for r in multimodal.neardup_assets_by_feature(
            assets, threshold=0.999, decode_stub=False
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) not in pairs and (1, 2) not in pairs
    # resize keeps PNG payloads PNG
    resized = multimodal.resize_images(assets, out_h=4, out_w=4).collect()
    assert len(resized) == 3
    for r in resized:
        assert bytes(r.payload)[:8] == multimodal._PNG_SIG
        assert multimodal.decode_png(bytes(r.payload)).shape == (4, 4, 3)


def test_incremental_neardup_stored_index_matches_inplan(spark, tmp_path, documents):
    """The storable-index contract: persisting banded_signatures to parquet
    and handing it back as base_index must give the identical result to
    deriving the base's signatures in-plan — the write/read cycle is the
    100 TB usage (index computed once per ingested batch, never per query)."""
    from baum_welch_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs_incremental,
    )
    from baum_welch_spark.operators.sampling import hash_split

    new_docs, base_docs = hash_split(documents, "doc_id", [0.2, 0.8], seed=11)
    idx_path = str(tmp_path / "band_index")
    banded_signatures(base_docs).write.parquet(idx_path)
    stored = spark.read.parquet(idx_path)
    inplan = {
        (r.doc_new, r.doc_base): r.jaccard
        for r in minhash_lsh_pairs_incremental(new_docs, base_docs).collect()
    }
    via_index = {
        (r.doc_new, r.doc_base): r.jaccard
        for r in minhash_lsh_pairs_incremental(
            new_docs, base_docs, base_index=stored
        ).collect()
    }
    assert inplan == via_index and inplan


def test_incremental_neardup_rejects_mismatched_index(spark, documents):
    """A stored band index built under a different banding must fail fast,
    not silently return no collisions."""
    from baum_welch_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs_incremental,
    )
    from baum_welch_spark.operators.sampling import hash_split

    new_docs, base_docs = hash_split(documents, "doc_id", [0.2, 0.8], seed=11)
    wrong = banded_signatures(base_docs, num_hashes=64, bands=16)
    with pytest.raises(ValueError, match="band ordinal"):
        minhash_lsh_pairs_incremental(new_docs, base_docs, base_index=wrong)


def test_incremental_neardup_accepts_empty_index(spark, documents):
    """An EMPTY stored index (empty base corpus) is legitimate — first
    ingestion into a fresh corpus — and must yield zero pairs, not a
    banding-mismatch error (ADVICE-r9)."""
    from baum_welch_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs_incremental,
    )

    base_docs = documents.filter(F.lit(False))
    empty_index = banded_signatures(base_docs)
    out = minhash_lsh_pairs_incremental(
        documents.limit(5), base_docs, base_index=empty_index
    )
    assert out.count() == 0


def test_minhash_batch_operator_banding_matches_banded_signatures(spark, documents):
    """minhash_lsh_pairs keeps an inline banding spelling (its face hash is
    pinned below the driver window), so its equivalence to the canonical
    banded_signatures frame must be TEST-enforced: candidates generated
    from banded_signatures buckets, verified with the same exact Jaccard,
    must equal the operator's output exactly."""
    from baum_welch_spark.operators.dedup import (
        banded_signatures,
        minhash_lsh_pairs,
        neardup_jaccard,
    )

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(documents, verify_threshold=0.4).collect()
    }
    b = banded_signatures(documents)
    a2 = b.toDF("doc_a", "band", "bkey")
    b2 = b.toDF("doc_b", "band", "bkey")
    cand = {
        (r.doc_a, r.doc_b)
        for r in a2.join(b2, ["band", "bkey"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in neardup_jaccard(documents, threshold=0.4).collect()
    }
    expect = {(a, c, exact[(a, c)]) for (a, c) in cand if (a, c) in exact}
    assert got == expect and got


def test_asset_lsh_centered_recall_past_switch(spark):
    """VERDICT-r9 #4: the LSH pair strategy must be VIABLE past the
    2,048-asset point where the blocked-GEMM path currently takes over,
    on the all-positive band-RMS feature space that skews origin
    hyperplanes. 2,304 real WAV assets (1,152 bases with per-time-band
    amplitude profiles + a near-identical noisy variant each):

    - end-to-end: the lsh strategy (center=True in the delegate) recovers
      >= 95% of the exact strategy's pairs, and returns no extra pairs
      (candidates are exact-verified at the same rounding);
    - mechanism: with the REAL sign matrix and real decoded features,
      mean-offset planes produce far fewer candidate pairs than origin
      planes, and far fewer than all-pairs — bucketing is doing real work,
      not collapsing into one mega-bucket the hot-bucket cap then drops.
    """
    n_base = 1152
    rng = np.random.default_rng(17)
    t = np.arange(1600) / 8000.0
    carrier = np.sin(2 * np.pi * 440 * t)
    meta = {"mime": "audio/wav", "width": None, "height": None, "duration_ms": 200}
    rows = []
    for i in range(n_base):
        amp = rng.uniform(0.1, 1.0, 8)
        x = np.repeat(amp, 200) * carrier
        noise = 0.003 * rng.standard_normal(1600)
        rows.append((i, "audio", multimodal.encode_wav(x), meta))
        rows.append((i + n_base, "audio", multimodal.encode_wav(x + noise), meta))
    assets = spark.createDataFrame(rows, schema=multimodal.ASSET_SCHEMA)

    def pairs(strategy):
        return {
            (r.asset_a, r.asset_b)
            for r in multimodal.neardup_assets_by_feature(
                assets, threshold=0.999, decode_stub=False, pair_strategy=strategy
            ).collect()
        }

    exact = pairs("blocked")
    assert len(exact) >= int(n_base * 0.9), "fixture must pair most base/variant duos"
    got = pairs("lsh")
    assert got <= exact  # same verify arithmetic: no false extras possible
    assert len(got & exact) / len(exact) >= 0.95

    # mechanism check with the real plane matrix on the real features
    from baum_welch_spark.operators.multimodal import extract_features
    from baum_welch_spark.operators.similarity import _lsh_sign_matrix

    feats = np.stack(
        [
            np.asarray(r.feature, dtype=np.float64)
            for r in extract_features(assets, decode_stub=False).collect()
        ]
    )
    bits, tables = 4, 8
    S = np.array(_lsh_sign_matrix(tables * bits, feats.shape[1]))  # (planes, d)
    proj = feats @ S.T  # (n, planes)
    mean_off = feats.mean(axis=0) @ S.T

    def candidate_pairs(offsets):
        total = 0
        sign = (proj > offsets).astype(np.int64)
        for tbl in range(tables):
            block = sign[:, tbl * bits : (tbl + 1) * bits]
            key = (block * (1 << np.arange(bits))).sum(axis=1)
            _, counts = np.unique(key, return_counts=True)
            total += int((counts * (counts - 1) // 2).sum())
        return total  # upper bound: per-table bucket pair sum (pre-dedup)

    origin = candidate_pairs(np.zeros_like(mean_off))
    centered = candidate_pairs(mean_off)
    n = feats.shape[0]
    all_pairs = n * (n - 1) // 2
    # centered planes: real bucketing (well under all-pairs per table), and
    # a large multiple fewer candidates than origin planes on this space
    assert centered < 0.25 * tables * all_pairs
    assert centered < origin / 3


def test_lsh_plane_groups_backward_compatible():
    """Planes 0..59 of the group-salted matrix must be bit-identical to the
    historical single-md5 derivation: every committed LSH face hash depends
    on them. Group 1+ planes extend the budget without touching group 0."""
    import hashlib

    dim = 64
    got = similarity._lsh_sign_matrix(60, dim)
    hs = [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in range(dim)]
    legacy = [[1.0 if (h >> p) & 1 else -1.0 for h in hs] for p in range(60)]
    assert got == legacy


def test_lsh_plane_groups_extend_past_60():
    """The plane budget is unbounded (SURVEY §8.3g: bits must grow ~log2(n)
    to hold expected bucket size constant, so a 1e9-vector corpus needs
    240 planes): group g > 0 planes are well-formed ±1 rows, distinct from
    the group-0 plane with the same bit index, and reasonably balanced."""
    dim = 64
    M = similarity._lsh_sign_matrix(130, dim)
    assert len(M) == 130 and all(len(r) == dim for r in M)
    assert all(v in (1.0, -1.0) for r in M for v in r)
    # a salted group must not replay group 0 (same bit, different hash)
    replayed = sum(M[p] == M[p - 60] for p in range(60, 120))
    assert replayed == 0
    # Rademacher balance: |mean| of a fair 64-coin row is ~N(0, 1/8);
    # bound loosely — a constant row (the all-positive-bucket failure
    # mode) has |mean| = 1
    assert all(abs(sum(r)) / dim < 0.6 for r in M)


def test_cosine_lsh_many_planes_spark_duckdb_parity(spark, embeddings):
    """72 planes (bits=9 x tables=8) crosses the 60-bit group boundary: the
    Spark operator and the generated DuckDB oracle must still agree pair-set
    and cosine exactly — pinning that both sides chain the group salt the
    same way."""
    import duckdb

    got = {
        (r.vec_a, r.vec_b): r.cos
        for r in similarity.cosine_neardup_lsh(embeddings, bits=9, tables=8).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF0001}/embeddings.parquet'"
    )
    want = {
        (a, b): c
        for a, b, c in con.sql(
            similarity.cosine_lsh_oracle_sql(bits=9, tables=8)
        ).fetchall()
    }
    assert got.keys() == want.keys() and len(got) > 0
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9


def test_leakage_safe_split_no_near_dup_crosses_splits(spark, documents):
    """The operator's reason to exist: every near-dup pair must land in ONE
    split — a doc_id-hash split leaks ~(1 - train) of a cluster's members
    into valid/test as contamination."""
    split = {
        r.doc_id: r.split for r in dedup.leakage_safe_split(documents).collect()
    }
    pairs = dedup.neardup_jaccard(documents, threshold=0.4).collect()
    assert len(pairs) > 0  # the invariant must be exercised, not vacuous
    straddling = [
        (r.doc_a, r.doc_b) for r in pairs if split[r.doc_a] != split[r.doc_b]
    ]
    assert straddling == []
    assert set(split) == {r.doc_id for r in documents.select("doc_id").collect()}


def test_leakage_safe_split_deterministic_and_salt_sensitive(spark, documents):
    """Same salt -> identical assignment (reproducible experiment splits);
    a different salt -> a genuinely different shuffle of clusters."""
    a = {r.doc_id: r.split for r in dedup.leakage_safe_split(documents).collect()}
    b = {r.doc_id: r.split for r in dedup.leakage_safe_split(documents).collect()}
    assert a == b
    c = {
        r.doc_id: r.split
        for r in dedup.leakage_safe_split(documents, salt="other").collect()
    }
    assert a != c


def test_leakage_safe_split_ratios_and_validation(spark, documents):
    """Split mass tracks the requested weights (hash-uniform over
    components), and nonsense weights fail fast."""
    rows = dedup.leakage_safe_split(documents, train=0.8, valid=0.1).collect()
    n = len(rows)
    frac_train = sum(r.split == "train" for r in rows) / n
    # ~500 docs: binomial 3-sigma around 0.8 is ~±0.06; bound loosely
    assert 0.7 < frac_train < 0.9, frac_train
    assert {r.split for r in rows} == {"train", "valid", "test"}
    with pytest.raises(ValueError, match="test mass"):
        dedup.leakage_safe_split(documents, train=0.95, valid=0.05)


def test_leakage_safe_split_plan_is_codegen_after_components(spark, documents):
    """Scale shape: past the component build, assignment is one left join
    plus pure-codegen hash/CASE — no nested-loop join anywhere, and no
    Python stage beyond the pair generator's."""
    rep = plan_report(dedup.leakage_safe_split(documents))
    assert rep["nested_loop_joins"] == 0, rep
