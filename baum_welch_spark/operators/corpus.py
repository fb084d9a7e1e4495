"""Corpus-level training-data operators over ``documents``: vocabulary
building, bigram language-model perplexity scoring, and benchmark
decontamination (n-gram overlap). These are the corpus-wide counterparts of
the per-document projections in :mod:`.text` — each one aggregates or joins
across documents, so the scale story is about shuffle shape, not scan speed.

Scale posture (100 TB corpus):

- ``vocab_topk`` — one combinable groupBy(token) (map-side partial agg turns
  the shuffle into |vocab|-sized traffic, not corpus-sized) followed by a
  driver-bound top-k that Catalyst executes as TakeOrderedAndProject (per
  partition top-k, no global sort materialization).
- ``bigram_lm_score`` — the doc-side bigram explode is pre-aggregated per
  (doc_id, bigram) BEFORE the global count, so every later shuffle moves
  distinct-bigram rows, never raw token instances. Count tables join back on
  bigram equi-keys (AQE picks broadcast when the vocabulary is small enough).
- ``decontaminate`` — in production the eval n-gram set is benchmark-sized
  by definition and broadcasts; the join is left UNHINTED so AQE makes that
  call from the measured build size (r12 100x-half-board lesson: the face's
  eval slice is a fixed FRACTION of the corpus, and a forced broadcast of a
  corpus-proportional side stalled a 500k-doc run — the hint encoded an
  assumption the parameterization didn't keep). The 100 TB training side is
  never shuffled except the final per-doc combinable count either way.

All three are pure Catalyst (no UDFs) with DuckDB-portable semantics, so
every operator is oracle-checked exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from baum_welch_spark.operators.quality import EMAIL_RE


def _words(col: str = "text"):
    # the package's canonical lowercased whitespace tokenizer
    from baum_welch_spark.functions.columns import words

    return words(col)


def vocab_topk(documents: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-``k`` tokens by term frequency with document
    frequency — the starting point for tokenizer/vocab training and the
    standard sanity report on a new corpus snapshot.

    Output: (token, tf, df) ordered by tf desc, token asc (deterministic
    tie-break). One shuffle (combinable groupBy), then TakeOrderedAndProject.
    """
    tok = documents.select(
        "doc_id", F.explode(_words()).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


VOCAB_TOPK_SQL = """
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents) t
GROUP BY token
ORDER BY tf DESC, token ASC
LIMIT 100
"""


def bigram_lm_score(documents: DataFrame) -> DataFrame:
    """In-domain bigram LM perplexity per document: train a maximum-likelihood
    bigram model on the corpus itself, then score each document by its
    per-bigram cross-entropy H = avg(-log2 P(w2|w1)) and perplexity 2^H — the
    classic "how typical is this document of the corpus" quality signal used
    to filter LLM training data (low perplexity = template/boilerplate, high
    = noise).

    Self-trained, so every bigram has nonzero probability (no smoothing
    needed) and the result is fully deterministic.

    Plan shape: doc bigrams are pre-aggregated per (doc_id, w1, w2) first, so
    the global count, the context count, and the scoring join all move
    distinct-bigram rows rather than token instances. Output:
    (doc_id, n_bigrams, cross_entropy, perplexity), docs with >= 1 bigram.
    """
    # split materialized as a column before the lambda (else Catalyst
    # re-evaluates it per element_at call — see dedup._shingles)
    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - 2)
    doc_bg = (
        documents.select("doc_id", _words().alias("ws"))
        .where(F.size(ws) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(ws, i + 1).alias("w1"),
                        F.element_at(ws, i + 2).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # materialize the per-doc bigram table once (guide §3.3, same cut as
    # trigram_lm_score): it feeds the count chain AND the scoring join, so
    # without it the tokenize + explode + agg runs twice from the scan
    doc_bg = doc_bg.localCheckpoint(eager=False)
    c12 = doc_bg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c12"))
    # bigram count table feeds c1 and the probs join — same cut
    c12 = c12.localCheckpoint(eager=False)
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    probs = c12.join(c1, "w1")
    scored = doc_bg.join(probs, ["w1", "w2"])
    nll = F.col("cnt") * -F.log2(F.col("c12") / F.col("c1"))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            (F.sum(nll) / F.sum("cnt")).alias("h"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(F.col("h"), 6).alias("cross_entropy"),
            F.round(F.pow(F.lit(2.0), F.col("h")), 4).alias("perplexity"),
        )
    )


BIGRAM_LM_SCORE_SQL = """
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 2
),
doc_bg AS (
  SELECT doc_id, ws[g] AS w1, ws[g+1] AS w2, count(*) AS cnt
  FROM words, unnest(generate_series(1, len(ws) - 1)) AS t(g)
  GROUP BY doc_id, ws[g], ws[g+1]
),
c12 AS (SELECT w1, w2, sum(cnt) AS c12 FROM doc_bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
scored AS (
  SELECT d.doc_id, d.cnt, c12.c12, c1.c1
  FROM doc_bg d JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_bigrams,
       round(sum(cnt * -log2(c12 * 1.0 / c1)) / sum(cnt), 6) AS cross_entropy,
       round(pow(2.0, sum(cnt * -log2(c12 * 1.0 / c1)) / sum(cnt)), 4) AS perplexity
FROM scored
GROUP BY doc_id
"""


def decontaminate(
    documents: DataFrame, eval_mod: int = 50, n: int = 5
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    ``n``-gram with the held-out eval set — the standard n-gram-overlap
    contamination check run before LLM training (eval docs here are the
    deterministic slice ``doc_id % eval_mod == 0``; in production the eval
    side is the benchmark suite).

    Output: (doc_id, n_overlap) for contaminated training docs only, where
    ``n_overlap`` counts the doc's distinct n-grams that appear anywhere in
    the eval set.

    Scale: in production the eval side is benchmark-sized regardless of
    corpus size and the join becomes a map-side semi-join; HERE the eval
    slice is a fixed fraction of the corpus (doc_id % eval_mod), so the
    join is deliberately UNHINTED — AQE broadcasts when the built eval set
    is genuinely small and falls back to a shuffle join when it is not.
    (r12: a forced F.broadcast here stalled the 100x half-board — the
    build side was corpus-proportional, exactly what the hint denied.)
    """
    # split materialized as a column before the lambda (else Catalyst
    # re-evaluates it per element_at call — see dedup._shingles)
    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(n)]),
        )
    )
    with_grams = (
        documents.select("doc_id", _words().alias("ws"))
        .where(F.size(ws) >= n)
        .select("doc_id", F.explode(grams).alias("g"))
    )
    eval_grams = (
        with_grams.where(F.col("doc_id") % eval_mod == 0).select("g").distinct()
    )
    train = with_grams.where(F.col("doc_id") % eval_mod != 0)
    return (
        train.join(eval_grams, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


DECONTAMINATE_SQL = """
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 5
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] || ' ' || ws[g+3] || ' ' || ws[g+4] AS g
  FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(g)
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0)
SELECT doc_id, count(*) AS n_overlap
FROM train JOIN eval_grams USING (g)
GROUP BY doc_id
"""


#: bloom geometry for :func:`decontaminate_bloom` — sized FROM the eval
#: suite (VERDICT-r13 #6): ~BLOOM_BITS_PER_GRAM bits per distinct eval
#: gram with k=3 probes gives ~1.7% FPR ((1-e^{-3/10})^3); the floor keeps
#: tiny demo suites at the old 2048-word/64 Ki-bit shape, the cap bounds
#: the densified broadcast row (8M words = 64 MB of longs — well under
#: executor broadcast comfort; past the cap a production deployment shards
#: the filter by gram-hash prefix rather than letting FPR drift up).
BLOOM_WORDS_FLOOR = 2048
BLOOM_WORDS_CAP = 1 << 23
BLOOM_BITS_PER_GRAM = 10
BLOOM_HASHES = 3


def bloom_words_for(n_eval_grams: int) -> int:
    """32-bit word count for a given eval-suite size — integer arithmetic
    shared VERBATIM (greatest/least/ceil-div) with the DuckDB oracle so
    both dialects derive the identical modulus from the identical count."""
    words = (BLOOM_BITS_PER_GRAM * n_eval_grams + 31) // 32
    return min(max(BLOOM_WORDS_FLOOR, words), BLOOM_WORDS_CAP)


def decontaminate_bloom(
    documents: DataFrame, eval_mod: int = 50, n: int = 5
) -> DataFrame:
    """Sketch-based decontamination: the same n-gram-overlap check as
    :func:`decontaminate`, but the eval set is compressed into a Bloom
    filter before the probe — the 100 TB-scale variant for when the eval
    suite itself is too large to broadcast as strings: ~10 bits per eval
    gram (k=3, ~1.7% FPR) means a billion held-out n-grams cost ~1.25 GB
    of bits instead of tens of GB of strings.

    Geometry is SIZED FROM THE EVAL SUITE (VERDICT-r13 #6): one count job
    over the eval grams (2% of the corpus; production persists the gram
    set it was about to build the filter from anyway) picks
    ``bloom_words_for(count)`` — floor 2048 words for demo suites, cap
    2^23 words (64 MB densified row) past which FPR is allowed to drift
    rather than the broadcast to grow; the r13 100x board measured the
    old FIXED 64 Ki-bit geometry saturating at ~1.7M grams (FPR -> 1,
    every train doc flagged), which is exactly the failure the sizing
    rule removes.

    Construction is pure relational algebra, so it runs distributed AND has
    a DuckDB-exact oracle: each eval gram sets k=3 bit positions via
    double hashing (Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m, h1/h2 =
    the two 30-bit halves of the portable 60-bit MD5 hash); positions pack
    into 32-bit lanes of a ``words``-row (word, bits) table via a
    ``bit_or`` aggregate, densified into ONE row holding the whole bitset
    as an array (8 KB). Probing is then entirely MAP-SIDE: the one-row
    bitset cross-joins (broadcast) onto the training grams and all k
    probes evaluate as ``element_at`` expressions on the array — no probe
    explode, no (doc_id, gram-string) shuffle. The r13 100x board caught
    the previous join-per-probe shape at 234x (each train gram shuffled
    k=3 rows carrying its 5-gram STRING through a groupBy(doc_id, g)
    bool_and); the rewrite's only shuffle is the final doc_id count.

    Output: (doc_id, n_flagged) for training docs with >= 1 flagged
    distinct n-gram. Supersets :func:`decontaminate` (no false negatives);
    ``n_flagged >= n_overlap`` with equality up to Bloom false positives.
    """
    from baum_welch_spark.functions.columns import portable_hash60

    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - n)
    grams = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j + 1) for j in range(n)]),
        )
    )
    with_grams = (
        documents.select("doc_id", _words().alias("ws"))
        .where(F.size(ws) >= n)
        .select("doc_id", F.explode(grams).alias("g"))
    )

    # size the filter from the suite it holds: one count job over the
    # (distinct) eval grams — the same set the build scans next
    eval_grams = (
        with_grams.where(F.col("doc_id") % eval_mod == 0).select("g").distinct()
    )
    # materialize the distinct eval grams ONCE (guide §3.3): the count job
    # below and the bit-position build both consume this frame — without
    # the cut the 2%-slice tokenize + explode + distinct runs twice
    eval_grams = eval_grams.localCheckpoint(eager=True)
    words = bloom_words_for(eval_grams.count())
    m = words * 32

    h = portable_hash60("g")
    h1 = (h % (1 << 30)).alias("h1")
    h2 = F.shiftright(h, 30).alias("h2")
    probes = F.explode(
        F.array(*[
            F.struct(((F.col("h1") + i * F.col("h2")) % m).alias("pos"))
            for i in range(BLOOM_HASHES)
        ])
    )

    eval_pos = (
        eval_grams.select(h1, h2)
        .select(probes.alias("p"))
        .select(
            (F.col("p.pos") / 32).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(p.pos % 32 as int))").alias("mask"),
        )
    )
    bloom = eval_pos.groupBy("word").agg(F.bit_or("mask").alias("bits"))

    # densify the (word, bits) rows into ONE row carrying the whole bitset
    # as an array — absent words are 0 (the old left-join's coalesce(False))
    bloom_one = bloom.agg(
        F.map_from_arrays(F.collect_list("word"), F.collect_list("bits")).alias("bm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("bm"), i), F.lit(0).cast("long")),
        ).alias("bits_arr")
    )

    # map-side probe: all k positions evaluate as element_at expressions on
    # the broadcast one-row bitset — identical pos/word/mask arithmetic to
    # the eval side, AND-ed without any probe explode or per-gram shuffle
    train = (
        with_grams.where(F.col("doc_id") % eval_mod != 0)
        .select("doc_id", h1, h2)
        .crossJoin(F.broadcast(bloom_one))
    )
    for i in range(BLOOM_HASHES):
        train = train.withColumn(f"pos{i}", (F.col("h1") + i * F.col("h2")) % m)
    hit = (
        "(element_at(bits_arr, cast(pos{i} / 32 as int) + 1)"
        " & shiftleft(1L, cast(pos{i} % 32 as int)))"
        " = shiftleft(1L, cast(pos{i} % 32 as int))"
    )
    flagged = F.expr(" AND ".join(hit.format(i=i) for i in range(BLOOM_HASHES)))
    return (
        train.where(flagged)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )


DECONTAMINATE_BLOOM_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 5
),
grams AS (
  SELECT DISTINCT doc_id,
         ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] || ' ' || ws[g+3] || ' ' || ws[g+4] AS g
  FROM words, unnest(generate_series(1, len(ws) - 4)) AS t(g)
),
hashed AS (
  SELECT doc_id, g,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 1073741824 AS h1,
         ('0x' || substr(md5(g), 1, 15))::BIGINT // 1073741824 AS h2
  FROM grams
),
-- geometry sized from the eval suite: same greatest/least/ceil-div
-- integer arithmetic as bloom_words_for(), so both dialects derive the
-- identical modulus from the identical distinct-gram count
geom AS (
  SELECT 32 * least(greatest({BLOOM_WORDS_FLOOR},
                    ({BLOOM_BITS_PER_GRAM} * count(DISTINCT g) + 31) // 32),
                    {BLOOM_WORDS_CAP}) AS m
  FROM hashed WHERE doc_id % 50 = 0
),
eval_pos AS (
  SELECT DISTINCT (h1 + i * h2) % (SELECT m FROM geom) AS pos
  FROM (SELECT DISTINCT g, h1, h2 FROM hashed WHERE doc_id % 50 = 0) e,
       unnest(generate_series(0, {BLOOM_HASHES - 1})) AS t(i)
),
bloom AS (
  SELECT (pos // 32)::INTEGER AS word, bit_or(1::BIGINT << (pos % 32)::INTEGER) AS bits
  FROM eval_pos GROUP BY pos // 32
),
train_probes AS (
  SELECT doc_id, g,
         ((h1 + i * h2) % (SELECT m FROM geom) // 32)::INTEGER AS word,
         (1::BIGINT << ((h1 + i * h2) % (SELECT m FROM geom) % 32)::INTEGER) AS mask
  FROM hashed, unnest(generate_series(0, {BLOOM_HASHES - 1})) AS t(i)
  WHERE doc_id % 50 <> 0
),
hits AS (
  SELECT p.doc_id, p.g,
         bool_and(coalesce((b.bits & p.mask) = p.mask, FALSE)) AS flagged
  FROM train_probes p LEFT JOIN bloom b ON p.word = b.word
  GROUP BY p.doc_id, p.g
)
SELECT doc_id, count(*) AS n_flagged
FROM hits WHERE flagged GROUP BY doc_id
"""


def corpus_report(documents: DataFrame) -> DataFrame:
    """One-row corpus datasheet — the summary a training-data pipeline
    publishes with every corpus snapshot: document/token volumes, language
    spread, exact-duplicate rate, and PII incidence.

    Everything is a combinable aggregate over one scan plus a
    fingerprint-cardinality count: two shuffles total, no joins, output is
    a single row at any corpus size.

    Output: (n_docs, total_tokens, avg_tokens, n_langs, top_lang,
    n_dup_docs, n_docs_with_email).
    """
    toks = F.size(_words())
    base = documents.select(
        "doc_id",
        "lang",
        toks.alias("n_toks"),
        F.md5("text").alias("fp"),
        (F.length(F.regexp_extract("text", EMAIL_RE, 0)) > 0).alias("has_email"),
    )
    lang_counts = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    top_lang = lang_counts.select(
        F.max_by("lang", F.struct(F.col("n"), F.col("lang"))).alias("top_lang"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).cast("bigint").alias("n_dup_docs"),
        F.sum(F.col("has_email").cast("bigint")).alias("n_docs_with_email"),
    )
    return stats.join(F.broadcast(top_lang), how="cross").select(
        "n_docs",
        "total_tokens",
        "avg_tokens",
        "n_langs",
        "top_lang",
        "n_dup_docs",
        "n_docs_with_email",
    )


CORPUS_REPORT_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         len(string_split(lower(text), ' ')) AS n_toks,
         md5(text) AS fp,
         len(regexp_extract(text, '{EMAIL_RE}')) > 0 AS has_email
  FROM documents
),
lc AS (SELECT lang, count(*) AS n FROM base GROUP BY lang),
tl AS (
  SELECT lang AS top_lang, CAST((SELECT count(*) FROM lc) AS BIGINT) AS n_langs
  FROM lc ORDER BY n DESC, lang DESC LIMIT 1
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       round(avg(n_toks), 4) AS avg_tokens,
       tl.n_langs, tl.top_lang,
       CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN has_email THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_email
FROM base, tl
GROUP BY tl.n_langs, tl.top_lang
"""


def tfidf_top_terms(documents: DataFrame, top_n: int = 3) -> DataFrame:
    """TF-IDF characteristic terms: the ``top_n`` highest-scoring tokens per
    document under smoothed tf-idf (sklearn-style
    ``idf = ln((N + 1) / (df + 1)) + 1``) — the classic
    keyword-extraction / relevance-weighting surface.

    Output: (doc_id, token, tf, score, rk) with deterministic tiebreak
    (score desc, token asc).

    Plan shape: tf is a combinable groupBy(doc_id, token); df reduces the tf
    table again by token; N joins in as a broadcast one-row aggregate; the
    final per-doc top-n is a row_number window over the doc_id partitioning
    the tf shuffle already established.
    """
    tok = documents.select("doc_id", F.explode(_words()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select("doc_id", "token", "tf", F.round(F.col("tf") * idf, 6).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .select("doc_id", "token", "tf", "score", "rk")
    )


TFIDF_TOP_TERMS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         round(tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1), 6) AS score
  FROM tf JOIN df USING (token), n
),
ranked AS (
  SELECT doc_id, token, tf, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rk
  FROM scored
)
SELECT doc_id, token, tf, score, rk FROM ranked WHERE rk <= 3
"""


def clean_corpus(
    documents: DataFrame,
    jaccard_threshold: float = 0.4,
    min_quality: float = 1.0,
    max_cross_entropy: float = 5.1,
    pair_generator=None,
    components: DataFrame | None = None,
) -> DataFrame:
    """The end-to-end training-data cleaning pipeline in one face: near-dup
    removal (exact-Jaccard connected components, keep the lowest doc_id per
    cluster) + heuristic quality gate (:func:`..text.doc_quality` score) +
    in-domain LM gate (:func:`bigram_lm_score` cross-entropy cap, dropping the
    "too surprising for this corpus" tail). Returns the surviving corpus rows
    (doc_id, lang, source).

    This is the composition a production corpus build runs before training;
    each stage is independently oracle-checked, and this face is too.

    Scale shape: the drop list (non-canonical cluster members) and the two
    gate lists are doc_id-only join sides — the anti/semi joins against the
    100 TB corpus shuffle ids, never text. The LM is trained on the FULL
    corpus (pre-filter), matching the oracle.

    ``pair_generator`` picks the near-dup pair source: ``None`` (default)
    uses exact trigram Jaccard (`dedup.neardup_jaccard`) for oracle parity —
    but the exact path shuffles every shingle instance, so its scale ceiling
    is well below 100 TB. At scale pass a banded generator, e.g.
    ``lambda d: minhash_lsh_pairs(d, verify_threshold=jaccard_threshold)``:
    candidates come from LSH buckets (no all-pairs shuffle) and are
    exact-verified, so the output pairs are a high-recall subset of the
    exact pairs and survivors can only grow by the (small) recall loss.

    ``components``: a precomputed ``connected_components`` frame (node,
    component) over the SAME pair definition — pass it when a pipeline has
    already clustered (``prepare_training_corpus`` shares one components
    pass between this gate and the split stage); pair generation and the
    iterative clustering are then skipped entirely.
    """
    from baum_welch_spark.operators.dedup import connected_components, neardup_jaccard
    from baum_welch_spark.operators.text import quality_score_col

    if components is not None:
        comp = components
    else:
        if pair_generator is None:
            pairs = neardup_jaccard(documents, threshold=jaccard_threshold)
        else:
            pairs = pair_generator(documents)
        comp = connected_components(pairs)
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    # quality gate as a map-side FILTER on the corpus scan (r15, guide
    # §2.4 remove shuffles outright): doc_quality is a shuffle-free
    # projection, so the old semi-join against its filtered doc_id list
    # re-scanned the corpus once more and paid a join for what is a pure
    # predicate. doc_id is unique, so semi-join == filter; the expression
    # is the same quality_score_col doc_quality itself uses — values
    # bit-identical by construction.
    lm_ok = (
        bigram_lm_score(documents)
        .filter(F.col("cross_entropy") <= max_cross_entropy)
        .select("doc_id")
    )
    return (
        documents.filter(quality_score_col() >= min_quality)
        .join(drop, "doc_id", "left_anti")
        .join(lm_ok, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
    )


def _clean_corpus_sql() -> str:
    from baum_welch_spark.operators.dedup import JACCARD_COMPONENTS_CTE
    from baum_welch_spark.operators.text import DOC_QUALITY_SQL

    return (
        JACCARD_COMPONENTS_CTE
        + f"""
, drop_docs AS (SELECT node FROM comp WHERE node <> component),
quality_ok AS (SELECT doc_id FROM ({DOC_QUALITY_SQL}) WHERE quality_score >= 1.0),
lm_ok AS (SELECT doc_id FROM ({BIGRAM_LM_SCORE_SQL}) WHERE cross_entropy <= 5.1)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT node FROM drop_docs)
  AND d.doc_id IN (SELECT doc_id FROM quality_ok)
  AND d.doc_id IN (SELECT doc_id FROM lm_ok)
"""
    )


def prepare_training_corpus(
    documents: DataFrame,
    jaccard_threshold: float = 0.4,
    min_quality: float = 1.0,
    max_cross_entropy: float = 5.1,
    eval_mod: int = 50,
    train: float = 0.8,
    valid: float = 0.1,
    pair_generator=None,
    salt: str = "split",
) -> DataFrame:
    """The full training-corpus build as ONE provably-exact composition
    (VERDICT-r10 #6): near-dup removal + quality gate + in-domain LM gate
    (:func:`clean_corpus`) → benchmark decontamination (drop the held-out
    eval slice AND every training doc sharing an eval n-gram,
    :func:`decontaminate`) → leakage-safe cluster-whole train/valid/test
    assignment (:func:`..dedup.leakage_safe_split`) → declarative dq gate
    over the final table (:func:`..dq.dq_report`) — the pipeline a
    production corpus build runs end-to-end before training, with each
    stage independently oracle-checked and the composition itself
    DuckDB-exact (PREPARE_TRAINING_CORPUS_SQL).

    The near-dup PAIR SET is computed once, the iterative
    connected-components clustering runs ONCE, and the resulting (node,
    component) frame is shared by the dedup stage and the split stage
    (both accept ``components=``) — neither the shingle shuffle nor the
    O(log d) label rounds repeat; at 100 TB pass a banded ``pair_generator``
    (``minhash_lsh_pairs``) exactly as documented on :func:`clean_corpus`,
    and every downstream stage is id-only joins against the corpus scan. The dq gate checks pipeline INVARIANTS
    (non-null unique doc_id, split ∈ {train, valid, test}) in one bounded
    aggregate and raises instead of emitting a corrupt corpus — gate
    semantics, not reporting.

    Output: surviving corpus rows (doc_id, lang, source, component, split),
    ordered by doc_id.
    """
    from baum_welch_spark.operators.dedup import neardup_jaccard, split_label_col
    from baum_welch_spark.operators.dq import dq_report

    from baum_welch_spark.operators.dedup import connected_components

    if not (0.0 < train and 0.0 <= valid and train + valid < 1.0):
        # the same guard leakage_safe_split applies — the split label is now
        # computed inline (below) so the guard must live here too
        raise ValueError(
            f"need 0 < train and 0 <= valid and train + valid < 1 to leave "
            f"test mass; got train={train}, valid={valid}"
        )
    if pair_generator is None:
        pairs = neardup_jaccard(documents, threshold=jaccard_threshold)
    else:
        pairs = pair_generator(documents)
    # persist the pair set, then run the ITERATIVE clustering exactly once
    # and hand the components to both consumers — the dedup drop-list and
    # the split assignment are two reads of the same (node, component)
    # frame, not two pointer-jumping runs (the shingle shuffle and the
    # O(log d) label rounds are the expensive parts of this composition)
    pairs = pairs.persist()
    try:
        comp = connected_components(pairs)
        kept = clean_corpus(
            documents,
            jaccard_threshold=jaccard_threshold,
            min_quality=min_quality,
            max_cross_entropy=max_cross_entropy,
            components=comp,
        )
        contaminated = decontaminate(documents, eval_mod=eval_mod).select("doc_id")
        # split assignment computed INLINE on the kept rows (r15, guide
        # §2.4): the old leakage_safe_split(...) call scanned the corpus a
        # second time, joined comp, SORTED by doc_id (an ordering the
        # subsequent join immediately destroyed), and was then inner-joined
        # back on doc_id. The label depends only on (doc_id, component), so
        # joining comp once onto the kept frame and applying the shared
        # split_label_col expression is value-identical for every surviving
        # row — one corpus scan, one join, and one full sort removed.
        node = comp.select(F.col("node").alias("doc_id"), "component")
        # persist the result BEFORE the gate: the gate's aggregate action
        # materializes it, so the caller's eventual collect/write reads the
        # cache instead of re-running the whole composition (id + short
        # string columns — row-light even at corpus scale; it stays cached
        # for the caller, the one live frame this builder retains)
        out = (
            kept.filter(F.col("doc_id") % eval_mod != 0)
            .join(contaminated, "doc_id", "left_anti")
            .join(node, "doc_id", "left")
            .withColumn("component", F.coalesce(F.col("component"), F.col("doc_id")))
            .withColumn("split", split_label_col(F.col("component"), train, valid, salt))
            .select("doc_id", "lang", "source", "component", "split")
            .orderBy("doc_id")
            .persist()
        )
        gate = dq_report(
            out,
            [
                {"rule": "not_null", "col": "doc_id"},
                {"rule": "unique", "col": "doc_id"},
                {"rule": "not_null", "col": "split"},
                {"rule": "in_set", "col": "split", "values": ["train", "valid", "test"]},
            ],
        ).collect()
        bad = [r for r in gate if r.n_violations > 0]
        if bad:
            raise ValueError(f"prepare_training_corpus dq gate failed: {bad}")
        return out
    finally:
        # comp labels are localCheckpoint()ed inside connected_components
        # and `out` is materialized by the gate, so the pair cache is no
        # longer referenced by the returned plan
        pairs.unpersist()


def prepare_training_corpus_sql(
    train: float = 0.8, valid: float = 0.1, salt: str = "split"
) -> str:
    """DuckDB-exact oracle for :func:`prepare_training_corpus` at the
    default exact-Jaccard pair generator: the shared transitive-closure CTE
    plus the clean_corpus gates, the decontamination NOT-IN, and the same
    salted 60-bit split hash with BIGINT-exact cutoffs."""
    from baum_welch_spark.operators.dedup import _HASH60_SPACE, JACCARD_COMPONENTS_CTE
    from baum_welch_spark.operators.text import DOC_QUALITY_SQL

    cut_train = int(train * _HASH60_SPACE)
    cut_valid = int((train + valid) * _HASH60_SPACE)
    h = (
        f"('0x' || substr(md5('{salt}:' || "
        "COALESCE(c.component, d.doc_id)::VARCHAR), 1, 15))::BIGINT"
    )
    return (
        JACCARD_COMPONENTS_CTE
        + f"""
, drop_docs AS (SELECT node FROM comp WHERE node <> component),
quality_ok AS (SELECT doc_id FROM ({DOC_QUALITY_SQL}) WHERE quality_score >= 1.0),
lm_ok AS (SELECT doc_id FROM ({BIGRAM_LM_SCORE_SQL}) WHERE cross_entropy <= 5.1),
contaminated AS (SELECT doc_id FROM ({DECONTAMINATE_SQL}))
SELECT d.doc_id, d.lang, d.source,
       COALESCE(c.component, d.doc_id) AS component,
       CASE WHEN {h} < {cut_train} THEN 'train'
            WHEN {h} < {cut_valid} THEN 'valid'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
WHERE d.doc_id NOT IN (SELECT node FROM drop_docs)
  AND d.doc_id IN (SELECT doc_id FROM quality_ok)
  AND d.doc_id IN (SELECT doc_id FROM lm_ok)
  AND d.doc_id % 50 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY d.doc_id
"""
    )


#: Stupid Backoff discount (Brants et al. 2007, "Large Language Models in
#: Machine Translation" — the backoff scheme designed for distributed LMs:
#: no normalization pass, every count table stays a plain aggregate)
SB_ALPHA = 0.4


def trigram_lm_score(documents: DataFrame, train_mod: int = 5) -> DataFrame:
    """Held-out trigram LM scoring with Stupid Backoff: train count tables
    on the ``doc_id % train_mod != 0`` slice, score EVERY document by its
    mean log10 backoff score — the distributed-LM quality signal (unlike
    the self-trained bigram LM, held-out docs genuinely exercise the
    backoff chain).

    S(w3|w1 w2) = c3/c2            when the trigram was seen in training
                = a * c2e/c1       else, when (w2, w3) was seen
                = a^2 * (c1' + 1)/(N + V)   else (Laplace-floored unigram)

    Plan shape (the Brants et al. point): every count table is a combinable
    aggregate over distinct n-grams — no normalization, no global pass; the
    scoring side pre-aggregates per (doc, trigram) so all five count joins
    move distinct-trigram rows, never token instances.

    Output: (doc_id, n_trigrams, avg_log_s, backoff_frac) for docs with
    >= 1 trigram; backoff_frac = fraction of trigram instances that fell
    back below the trigram level.
    """
    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - 3)
    doc_tg = (
        documents.select("doc_id", _words().alias("ws"))
        .where(F.size(ws) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at(ws, i + 1).alias("w1"),
                        F.element_at(ws, i + 2).alias("w2"),
                        F.element_at(ws, i + 3).alias("w3"),
                    ),
                )
            ).alias("tg"),
        )
        .select("doc_id", "tg.w1", "tg.w2", "tg.w3")
        .groupBy("doc_id", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # materialize the per-doc trigram table once (guide §3.3): it feeds the
    # training-count chain AND the scoring join side — without the cut,
    # every count table below re-runs the tokenize + explode + count
    # aggregation from the corpus scan (measured 52 Exchanges / 14 scans in
    # the static plan). One pass builds it; everything downstream is
    # joins/aggs over distinct-trigram rows.
    doc_tg = doc_tg.localCheckpoint(eager=False)
    train = doc_tg.where(F.col("doc_id") % train_mod != 0)
    c3 = train.groupBy("w1", "w2", "w3").agg(F.sum("cnt").alias("c3"))
    # the trigram count table feeds c2ctx/c2e/c1 and the scored join — same
    # cut (distinct-trigram-sized, far smaller than doc_tg)
    c3 = c3.localCheckpoint(eager=False)
    c2ctx = c3.groupBy("w1", "w2").agg(F.sum("c3").alias("c2"))
    c2e = c3.groupBy("w2", "w3").agg(F.sum("c3").alias("c2e"))
    # unigram counts from the same trigram stream (center position), plus
    # totals for the Laplace floor
    c1 = c3.groupBy("w2").agg(F.sum("c3").alias("c1"))
    c1w3 = c1.select(F.col("w2").alias("w3"), F.col("c1").alias("c1w3"))
    totals = c1.agg(
        F.sum("c1").alias("n_total"), F.count(F.lit(1)).alias("v_size")
    )

    scored = (
        doc_tg.join(c3, ["w1", "w2", "w3"], "left")
        .join(c2ctx, ["w1", "w2"], "left")
        .join(c2e, ["w2", "w3"], "left")
        .join(c1, ["w2"], "left")
        .join(c1w3, ["w3"], "left")
        .join(F.broadcast(totals), how="cross")
    )
    s1 = (F.coalesce(F.col("c1w3"), F.lit(0)) + 1) / (F.col("n_total") + F.col("v_size"))
    s = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2"))
        .when(F.col("c2e").isNotNull(), SB_ALPHA * (F.col("c2e") / F.col("c1")))
        .otherwise(SB_ALPHA * SB_ALPHA * s1)
    )
    fell_back = F.when(F.col("c3").isNull(), F.col("cnt")).otherwise(F.lit(0))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_trigrams"),
            (F.sum(F.col("cnt") * F.log10(s)) / F.sum("cnt")).alias("als"),
            (F.sum(fell_back) / F.sum("cnt")).alias("bf"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.round(F.col("als"), 6).alias("avg_log_s"),
            F.round(F.col("bf"), 6).alias("backoff_frac"),
        )
    )


TRIGRAM_LM_SCORE_SQL = f"""
WITH words AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
  WHERE len(string_split(lower(text), ' ')) >= 3
),
doc_tg AS (
  SELECT doc_id, ws[g] AS w1, ws[g+1] AS w2, ws[g+2] AS w3, count(*) AS cnt
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
  GROUP BY doc_id, ws[g], ws[g+1], ws[g+2]
),
train AS (SELECT * FROM doc_tg WHERE doc_id % 5 <> 0),
c3 AS (SELECT w1, w2, w3, sum(cnt) AS c3 FROM train GROUP BY w1, w2, w3),
c2ctx AS (SELECT w1, w2, sum(c3) AS c2 FROM c3 GROUP BY w1, w2),
c2e AS (SELECT w2, w3, sum(c3) AS c2e FROM c3 GROUP BY w2, w3),
c1 AS (SELECT w2, sum(c3) AS c1 FROM c3 GROUP BY w2),
totals AS (SELECT sum(c1) AS n_total, count(*) AS v_size FROM c1),
scored AS (
  SELECT d.doc_id, d.cnt,
         CASE
           WHEN t3.c3 IS NOT NULL THEN t3.c3 * 1.0 / t2.c2
           WHEN te.c2e IS NOT NULL THEN {SB_ALPHA} * (te.c2e * 1.0 / t1.c1)
           ELSE {SB_ALPHA} * {SB_ALPHA} *
                ((coalesce(u3.c1, 0) + 1) * 1.0 / (tt.n_total + tt.v_size))
         END AS s,
         CASE WHEN t3.c3 IS NULL THEN d.cnt ELSE 0 END AS fell_back
  FROM doc_tg d
  LEFT JOIN c3 t3 ON d.w1 = t3.w1 AND d.w2 = t3.w2 AND d.w3 = t3.w3
  LEFT JOIN c2ctx t2 ON d.w1 = t2.w1 AND d.w2 = t2.w2
  LEFT JOIN c2e te ON d.w2 = te.w2 AND d.w3 = te.w3
  LEFT JOIN c1 t1 ON d.w2 = t1.w2
  LEFT JOIN c1 u3 ON d.w3 = u3.w2
  CROSS JOIN totals tt
)
SELECT doc_id,
       CAST(sum(cnt) AS BIGINT) AS n_trigrams,
       round(sum(cnt * log10(s)) / sum(cnt), 6) AS avg_log_s,
       round(sum(fell_back) * 1.0 / sum(cnt), 6) AS backoff_frac
FROM scored GROUP BY doc_id
"""


def ppl_filter(documents: DataFrame, keep_fraction: float = 0.8, train_mod: int = 5) -> DataFrame:
    """Perplexity-percentile corpus filter — the CCNet/Gopher-style quality
    gate: score every document with the held-out trigram Stupid-Backoff LM
    (:func:`trigram_lm_score`; higher ``avg_log_s`` = more fluent), then
    keep the most fluent ``keep_fraction`` by GLOBAL percent-rank.

    A percentile cut (unlike a fixed threshold) is stable across corpora
    whose absolute LM scores drift — but naively it is a global sort. Uses
    :func:`relational.global_rank` (range-partitioned two-phase rank) over
    the doc-count-sized score frame, so no stage funnels the corpus through
    one partition. Tie-break on doc_id makes the rank unique, so
    rank()/percent_rank() semantics match the oracle exactly.

    Output: (doc_id, avg_log_s, rk, pct_rank) for kept docs.
    """
    from baum_welch_spark.operators.relational import global_rank

    scored = trigram_lm_score(documents, train_mod=train_mod).select(
        "doc_id", "avg_log_s"
    )
    ranked = global_rank(
        scored, [F.desc("avg_log_s"), F.asc("doc_id")], rank_col="rk", pct_col="__pct"
    )
    return (
        ranked.withColumn("pct_rank", F.round(F.col("__pct"), 6))
        .filter(F.col("pct_rank") <= keep_fraction)
        .select("doc_id", "avg_log_s", "rk", "pct_rank")
        .orderBy("rk")
    )


def _ppl_filter_sql(keep_fraction: float = 0.8) -> str:
    return f"""
WITH base AS ({TRIGRAM_LM_SCORE_SQL}),
ranked AS (
  SELECT doc_id, avg_log_s,
         rank() OVER (ORDER BY avg_log_s DESC, doc_id ASC) AS rk,
         round(percent_rank() OVER (ORDER BY avg_log_s DESC, doc_id ASC), 6) AS pct_rank
  FROM base
)
SELECT doc_id, avg_log_s, rk, pct_rank FROM ranked
WHERE pct_rank <= {keep_fraction} ORDER BY rk
"""
