"""Corpus-level operator tests: vocabulary building, bigram LM perplexity
scoring, decontamination — semantics on tiny hand-checkable inputs plus plan
shape (the broadcast decontamination join is part of the scale contract)."""

import math

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators import corpus
from baum_welch_spark.plans.audit import plan_report
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF0001, "documents").cache()


def test_vocab_topk_counts_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "c")],
        schema="doc_id bigint, text string",
    )
    rows = corpus.vocab_topk(df, k=2).collect()
    # tf: a=3, b=3, c=2 -> top-2 is the (a, b) tie broken alphabetically
    assert [(r.token, r.tf, r.df) for r in rows] == [("a", 3, 2), ("b", 3, 2)]


def test_bigram_lm_score_matches_hand_computation(spark):
    # corpus bigrams: (a,b) x2 from docs 1,2; (b,a) x1 from doc 1
    # contexts: c1(a)=2, c1(b)=1 -> P(b|a)=1.0? no: c12(a,b)=2, c1(a)=2 -> 1.0
    # P(a|b)=c12(b,a)/c1(b)=1/1=1.0 -> every doc entropy 0, perplexity 1
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a b")],
        schema="doc_id bigint, text string",
    )
    # doc1 bigrams: (a,b), (b,a); doc2: (a,b)
    # c12: (a,b)=2, (b,a)=1; c1: a=2, b=1 -> all conditional probs 1.0
    rows = {r.doc_id: r for r in corpus.bigram_lm_score(df).collect()}
    assert rows[1].n_bigrams == 2 and rows[2].n_bigrams == 1
    assert rows[1].cross_entropy == 0.0 and rows[2].perplexity == 1.0

    # asymmetric case: doc3 adds (a,c) so P(b|a)=2/3, P(c|a)=1/3
    df2 = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "a c")],
        schema="doc_id bigint, text string",
    )
    rows2 = {r.doc_id: r for r in corpus.bigram_lm_score(df2).collect()}
    # doc3's single bigram (a,c): H = -log2(1/3)
    assert rows2[3].cross_entropy == round(-math.log2(1 / 3), 6)
    # doc2's single bigram (a,b): H = -log2(2/3)
    assert rows2[2].cross_entropy == round(-math.log2(2 / 3), 6)
    # doc1: bigrams (a,b) and (b,a): H = (-log2(2/3) - log2(1)) / 2
    assert rows2[1].cross_entropy == round(-math.log2(2 / 3) / 2, 6)
    assert rows2[1].perplexity == round(2 ** (-math.log2(2 / 3) / 2), 4)


def test_decontaminate_flags_planted_overlap(spark):
    shared = "one two three four five"
    df = spark.createDataFrame(
        [
            (0, f"eval doc says {shared} end"),          # eval (doc_id % 50 == 0)
            (1, f"train doc copies {shared} verbatim"),  # contaminated
            (2, "totally different text with no overlap at all"),
            (3, f"another copy {shared} here twice {shared} yes"),
        ],
        schema="doc_id bigint, text string",
    )
    rows = {r.doc_id: r.n_overlap for r in corpus.decontaminate(df).collect()}
    # doc1 shares exactly the one distinct 5-gram; doc3 also counts it once
    # (distinct per doc), doc2 clean, doc0 is eval-side so never reported
    assert rows == {1: 1, 3: 1}


def test_decontaminate_plan_broadcasts_eval_side(spark, documents):
    report = plan_report(corpus.decontaminate(documents))
    assert report["broadcast_joins"] >= 1
    assert report["nested_loop_joins"] == 0
    # the corpus-side n-gram explode must not shuffle before the join: only
    # the eval-side distinct and the final per-doc aggregate shuffle
    # (the broadcast exchange is not counted as a shuffle)
    assert report["shuffles"] <= 2


def test_bigram_lm_score_on_real_docs_is_finite(spark, documents):
    rows = corpus.bigram_lm_score(documents).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_bigrams >= 1
        assert 0.0 <= r.cross_entropy < 30.0
        assert r.perplexity >= 1.0


def test_tfidf_scores_match_hand_computation(spark):
    import math as m

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "x y")],
        schema="doc_id bigint, text string",
    )
    # N=3; df: x=3, y=2, z=1; idf = ln((N+1)/(df+1)) + 1
    rows = corpus.tfidf_top_terms(df, top_n=3).collect()
    by = {(r.doc_id, r.token): r for r in rows}
    idf_x = m.log(4 / 4) + 1
    idf_y = m.log(4 / 3) + 1
    idf_z = m.log(4 / 2) + 1
    assert by[(1, "x")].score == round(2 * idf_x, 6)
    assert by[(1, "y")].score == round(1 * idf_y, 6)
    assert by[(2, "z")].score == round(1 * idf_z, 6)
    # rank 1 in doc 2 is z (higher idf than x)
    assert by[(2, "z")].rk == 1 and by[(2, "x")].rk == 2


def test_time_bucket_gapfill_fills_and_carries_forward(spark):
    from baum_welch_spark.operators import relational

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 7, "view", 10.0, "{}"),
            (2, "2024-01-01 02:20:00", 7, "view", 4.0, "{}"),
            (3, "2024-01-01 01:00:00", 8, "click", 1.0, "{}"),
        ],
        schema="event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {(r.event_type, r.bucket): r for r in relational.time_bucket_gapfill(df).collect()}
    # view spans hours 00..02 -> 3 buckets, hour 01 is a gap
    gap = rows[("view", "2024-01-01 01:00:00")]
    assert gap.n_events == 0 and gap.total_value == 0.0
    assert gap.locf_value == 10.0  # carried forward from hour 00
    assert rows[("view", "2024-01-01 02:00:00")].locf_value == 4.0
    # click has a single bucket, no spine expansion
    assert ("click", "2024-01-01 00:00:00") not in rows
    assert rows[("click", "2024-01-01 01:00:00")].n_events == 1
    assert len([k for k in rows if k[0] == "view"]) == 3


def test_clean_corpus_drops_dups_and_low_quality(spark):
    # doc 1/2 near-identical (dup cluster keeps 1); doc 3 too short for the
    # quality length band; docs must pass BOTH gates and dedup
    long_filler = " ".join(["the quick brown fox jumps over a lazy dog and then"] * 4)
    df = spark.createDataFrame(
        [
            (1, long_filler),
            (2, long_filler + " extra"),
            (3, "tiny"),
            (4, " ".join(["of and to in a the words flow onward again here"] * 4)),
        ],
        schema="doc_id bigint, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    # loose LM cap: these tiny corpora have low entropy; gate on dup+quality
    kept = {r.doc_id for r in corpus.clean_corpus(df, max_cross_entropy=30.0).collect()}
    assert 2 not in kept          # non-canonical duplicate dropped
    assert 3 not in kept          # fails the length band
    assert {1, 4} <= kept


def test_clean_corpus_plan_joins_on_ids_only(spark, documents):
    report = plan_report(corpus.clean_corpus(documents))
    assert report["nested_loop_joins"] == 0


def test_clean_corpus_minhash_pair_generator(spark, documents):
    """The scale path: clean_corpus with MinHash-LSH pairs must keep at
    least every doc the exact-Jaccard path keeps (LSH pairs are an
    exact-verified SUBSET of the exact pairs at the same threshold, so the
    drop list can only shrink), and the two survivor sets should agree
    almost everywhere (recall loss is bounded, not structural)."""
    from baum_welch_spark.operators.dedup import minhash_lsh_pairs

    thr = 0.4
    exact = {r["doc_id"] for r in corpus.clean_corpus(documents, jaccard_threshold=thr).collect()}
    lsh = {
        r["doc_id"]
        for r in corpus.clean_corpus(
            documents,
            jaccard_threshold=thr,
            pair_generator=lambda d: minhash_lsh_pairs(d, verify_threshold=thr),
        ).collect()
    }
    assert exact <= lsh  # missed pairs can only ADD survivors
    assert len(lsh - exact) <= max(3, len(exact) // 20)  # bounded recall loss


def test_bm25_matches_numpy_reference(spark):
    """BM25 scores against a direct NumPy computation on a tiny corpus."""
    import math

    from baum_welch_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk

    docs = [
        (0, "spark join spark merge table"),
        (1, "join merge join window"),
        (2, "filter scan vector vector"),
        (3, "spark spark spark spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r["q_id"], r["doc_id"]): (r["score"], r["rk"])
        for r in bm25_topk(df, queries=[(0, "spark join")], k=10).collect()
    }

    toks = {d: t.split() for d, t in docs}
    N = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / N
    exp = {}
    for d, t in toks.items():
        s = 0.0
        for term in ["spark", "join"]:
            tf = t.count(term)
            if tf == 0:
                continue
            dfreq = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (N - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf * (BM25_K1 + 1) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(t) / avgdl))
        if s > 0:
            exp[d] = round(s, 6)
    assert set(out) == {(0, d) for d in exp}
    for (q, d), (score, rk) in out.items():
        assert abs(score - exp[d]) < 1e-6
    # rank order follows rounded score desc
    ranked = sorted(out.values(), key=lambda x: x[1])
    assert all(a[0] >= b[0] for a, b in zip(ranked, ranked[1:]))


def test_dup_ngrams_finds_planted_boilerplate(spark):
    """A 5-gram shared across docs (boilerplate) must surface with the right
    df/total counts; unique text must not appear; short docs must not error."""
    from baum_welch_spark.operators.ngramaudit import dup_ngrams

    boiler = "all rights reserved by acme"
    docs = [
        (0, f"alpha beta {boiler} gamma"),
        (1, f"{boiler} delta epsilon"),
        (2, f"unique words only here today {boiler}"),
        (3, "totally different text with no repeats whatsoever"),
        (4, "tiny"),  # shorter than n
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["ngram"]: (r["total_count"], r["df"]) for r in dup_ngrams(df, n=5).collect()}
    assert out[boiler] == (3, 3)
    assert all("whatsoever" not in g for g in out)
    # every reported ngram is shared by >= 2 docs
    assert all(d >= 2 for _, d in out.values())


def test_bm25_query_case_insensitive(spark):
    """Mixed-case query terms must match the lowercased corpus tokens —
    'Spark' and 'spark' are the same query."""
    from baum_welch_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(0, "spark join spark merge"), (1, "filter scan")], "doc_id long, text string"
    )
    lower = bm25_topk(df, queries=[(0, "spark join")], k=10).collect()
    mixed = bm25_topk(df, queries=[(0, "Spark JOIN")], k=10).collect()
    assert [tuple(r) for r in lower] == [tuple(r) for r in mixed]
    assert lower  # and they actually matched something


def test_bm25_plan_filters_corpus_before_shuffle(spark, documents):
    """The posting build must filter to query terms (pushed into the scan
    side) so the corpus-wide (doc, term) shuffle only carries matches."""
    from baum_welch_spark.operators.retrieval import bm25_topk
    from baum_welch_spark.plans.audit import plan_report

    rep = plan_report(bm25_topk(documents))
    # the only nested-loop join allowed is the 1-row corpus-constants
    # broadcast (N, avgdl) — a constant side, not a data-sized cartesian
    assert rep["nested_loop_joins"] <= 1
    assert rep["broadcast_joins"] >= 2  # query terms + df_t broadcast
    assert rep["python_stages"] == 0  # pure Catalyst


def test_bloom_decontaminate_supersets_exact(spark, documents):
    """Bloom filters have no false negatives: every doc the exact n-gram
    check flags must be Bloom-flagged, with n_flagged >= n_overlap (false
    positives can only add)."""
    from baum_welch_spark.operators.corpus import decontaminate, decontaminate_bloom

    exact = {r["doc_id"]: r["n_overlap"] for r in decontaminate(documents).collect()}
    bloom = {r["doc_id"]: r["n_flagged"] for r in decontaminate_bloom(documents).collect()}
    for doc_id, n_overlap in exact.items():
        assert doc_id in bloom, f"false negative: doc {doc_id}"
        assert bloom[doc_id] >= n_overlap


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark, documents):
    """CMS point estimates are overestimates by construction; with 4x4096
    buckets vs a tiny synthetic vocab the top-k estimates should be exact
    or nearly so."""
    from baum_welch_spark.operators.sketches import vocab_topk_cms

    rows = vocab_topk_cms(documents, k=50).collect()
    assert rows
    for r in rows:
        assert r["tf_est"] >= r["tf"], (r["token"], r["tf"], r["tf_est"])
        # collision slack: total tokens / width per probe row, 4 rows -> min
        assert r["tf_est"] - r["tf"] <= max(5, 0.02 * r["tf"]) * 4


def test_cms_shuffle_is_geometry_bounded(spark, documents):
    """The sketch build must aggregate on the fixed (row, bucket) key space —
    at most DEPTH x WIDTH result rows no matter the vocabulary."""
    from baum_welch_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, cms_build
    from pyspark.sql import functions as F

    toks = documents.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    cms = cms_build(toks)
    assert cms.count() <= CMS_DEPTH * CMS_WIDTH
    total = cms.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    n_toks = toks.count()
    assert all(r["s"] == n_toks for r in total)  # each probe row sees every token


def test_trigram_stupid_backoff_hand_computation(spark):
    """Each backoff level verified on a tiny corpus: seen trigram (no
    backoff), seen (w2,w3) bigram (one level), Laplace-floored unigram."""
    from baum_welch_spark.operators.corpus import SB_ALPHA, trigram_lm_score

    docs = [
        (1, "a b c a b c"),   # train: c3 = {abc:2, bca:1, cab:1}
        (2, "b c d"),         # train: c3 += {bcd:1}
        (5, "a b c"),         # held out: seen trigram
        (10, "x b c"),        # held out: backoff to (b, c)
        (15, "q q q"),        # held out: unigram floor (q unseen)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in trigram_lm_score(df).collect()}

    import math

    # c2(ab)=2 -> S(abc)=2/2=1.0
    assert rows[5]["avg_log_s"] == 0.0 and rows[5]["backoff_frac"] == 0.0
    # c2e(b,c)=2, c1(b)=2 -> S = a * 2/2 = a
    assert rows[10]["avg_log_s"] == round(math.log10(SB_ALPHA), 6)
    assert rows[10]["backoff_frac"] == 1.0
    # N=5 center tokens, V=3 -> S = a^2 * (0+1)/(5+3)
    assert rows[15]["avg_log_s"] == round(math.log10(SB_ALPHA**2 / 8), 6)
    assert rows[15]["backoff_frac"] == 1.0
    # train docs score too (self-seen trigrams, no backoff)
    assert rows[1]["backoff_frac"] == 0.0


def test_prepare_training_corpus_composes_its_stages(spark, documents):
    """The composition face must agree with its stages run independently:
    survivors are exactly clean_corpus minus the eval slice minus
    contaminated docs; split/component match leakage_safe_split; the
    assignment is cluster-whole (no component straddles splits); and the
    dq invariant gate passed (the function returns instead of raising)."""
    from baum_welch_spark.operators.corpus import (
        clean_corpus,
        decontaminate,
        prepare_training_corpus,
    )
    from baum_welch_spark.operators.dedup import leakage_safe_split

    out = prepare_training_corpus(documents).collect()
    got = {r.doc_id: (r.component, r.split) for r in out}
    assert got, "composition produced an empty corpus"

    kept = {r.doc_id for r in clean_corpus(documents).collect()}
    contaminated = {r.doc_id for r in decontaminate(documents).collect()}
    expected_ids = {
        d for d in kept if d % 50 != 0 and d not in contaminated
    }
    assert set(got) == expected_ids

    splits = {
        r.doc_id: (r.component, r.split)
        for r in leakage_safe_split(documents).collect()
    }
    for d, (comp_id, split) in got.items():
        assert splits[d] == (comp_id, split)

    by_comp = {}
    for d, (comp_id, split) in got.items():
        by_comp.setdefault(comp_id, set()).add(split)
    assert all(len(s) == 1 for s in by_comp.values()), "split straddles a cluster"
    assert {s for _, (_, s) in got.items()} <= {"train", "valid", "test"}
