"""Deduplication operators over ``documents`` (north-star §2.7):

  * exact dedup            — md5 hash groupBy (oracle-checked)
  * fingerprint clusters   — sorted-distinct-word key collisions (oracle-checked)
  * n-gram Jaccard near-dup— word-trigram shingle self-join (oracle-checked)
  * MinHash + LSH near-dup — signature/band/bucket-join (rows-only check:
                             hash functions are engine-specific)
  * SimHash near-dup       — 64-bit simhash + banded hamming join (rows-only)

All pure Catalyst: shingling is explode/transform, signatures are plain
aggregates, banding is an explode + equi-join. No Python UDFs anywhere.

Scale notes: exact/fingerprint dedup shuffle once on the hash key. The
Jaccard self-join is the textbook |shingle| equi-join — at 100 TB you bound
it by banding (the MinHash path) rather than joining raw shingles; both
forms are implemented here, the exact one doubling as the oracle for the
approximate one's candidate quality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from baum_welch_spark.functions.columns import pair_structs

# 2^31-1: keeps a_k * h + b_k far below the long range (ANSI overflow checks)
MERSENNE_P = (1 << 31) - 1


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash; canonical = min doc_id.

    (reference has no dedup; this is the `dropDuplicates`/sha-groupBy shape
    from SURVEY §2.7 with a portable md5 key.)
    """
    return (
        documents.select("doc_id", F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM (SELECT doc_id, md5(text) AS h FROM documents)
GROUP BY h
"""


def fingerprint_clusters(documents: DataFrame) -> DataFrame:
    """Near-dup clusters whose canonical fingerprint (sorted distinct lowercase
    words) collides; returns clusters with >1 member."""
    fp = documents.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(F.split(F.lower(F.col("text")), " "))), " ").alias("fp"),
    )
    return (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("canonical_doc_id", "n_docs")
    )


FINGERPRINT_CLUSTERS_SQL = """
WITH fp AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS fp
  FROM documents
)
SELECT min(doc_id) AS canonical_doc_id, count(*) AS n_docs
FROM fp GROUP BY fp HAVING count(*) > 1
"""


def shingle_array(k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array expression over a
    MATERIALIZED words column named ``ws`` (project ``split(text, ' ')`` as
    ``ws`` first; an inlined split would be re-evaluated by Catalyst for
    every ``element_at`` call in the lambda — measured 7x slower at sf0.1).

    The ONE definition of the shingling convention: the batch dedup suite
    and streaming.neardup's per-row path both build from it — a divergence
    (separator, casing, distinctness) would silently stop streamed docs from
    colliding with batch-built buckets.
    """
    ws = F.col("ws")
    idx = F.sequence(F.lit(0), F.size(ws) - k)
    return F.array_distinct(
        F.transform(
            idx, lambda g: F.concat_ws(" ", *[F.element_at(ws, g + i + 1) for i in range(k)])
        )
    )


def _shingles(documents: DataFrame, k: int = 3) -> DataFrame:
    """Distinct word k-gram shingles per document (docs with >= k words),
    exploded to (doc_id, s) rows. The Generate node between the two
    projections keeps CollapseProject from re-inlining the split."""
    return (
        documents.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size(F.col("ws")) >= k)
        .select("doc_id", F.explode(shingle_array(k)).alias("s"))
    )


def neardup_jaccard(
    documents: DataFrame, threshold: float = 0.2, max_doc_freq: int = 1000
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via shingle self-join.

    Jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) over distinct word trigrams.

    Hot-shingle safety: a shingle shared by k docs materializes a
    k^2/2-struct pair array in ONE row of the groupBy(shingle) stage, so a
    boilerplate trigram ("all rights reserved") in a real corpus would OOM a
    single task. Shingles with document frequency > ``max_doc_freq`` are
    dropped BEFORE pair generation, bounding every row to max_doc_freq^2/2
    structs. This is the standard dedup-pipeline df-cap: a shingle that
    common carries ~no similarity signal, but dropped shingles do shrink
    the measured intersection (never the union denominator's set sizes), so
    pairs whose overlap is mostly boilerplate may fall below ``threshold``
    — raise the cap (or pre-filter boilerplate) if that recall matters;
    the MinHash path handles corpora where hot shingles are structural.
    """
    return (
        _pair_intersections(documents, max_doc_freq)
        .withColumn("jaccard", F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _pair_intersections(documents: DataFrame, max_doc_freq: int) -> DataFrame:
    """Shared exact pair-overlap core of neardup_jaccard / neardup_containment:
    (doc_a, doc_b, c, na, nb) with c the distinct-shingle intersection and
    na/nb the per-doc shingle-set sizes (doc_a < doc_b).

    Pair-generation via groupBy(shingle) + sorted doc list + pair explode:
    one shuffle of the shingle instances instead of the self-join's two,
    and the pair blowup happens inside codegen, not in an SMJ. Identical
    output to the a.s == b.s AND a.doc < b.doc self-join (verified), ~1.7x
    faster at sf0.1.
    (the collect_list row itself is O(k) = 8 bytes/doc pre-filter — linear,
    not quadratic; only the post-filter pair transform is k^2)
    """
    sh = _shingles(documents)
    # per-doc set size WITHOUT a shuffle: |distinct shingles of doc| is just
    # the length of the (already-distinct) shingle array, so it is a
    # map-side projection — the old groupBy(doc_id).count() re-exploded and
    # re-SHUFFLED every shingle instance a second time only to count rows
    # per doc (guide §2.4: remove shuffles outright). Identical values by
    # construction: explode emits exactly the array's elements.
    # materialized once (localCheckpoint): the table joins in TWICE below
    # (sa for doc_a, sb for doc_b), and without an Exchange in its subtree
    # there is no ReuseExchange to dedup the two sides — each would re-scan
    # documents and re-run the shingle-array fold (r14: pagerank_docs, whose
    # symmetric edge union doubles the pair pipeline again, measured 2x hot
    # from exactly this recompute). The frame is (id, int) per corpus doc —
    # decision-sized, never text-sized.
    # (r14 optimization round, measured and REJECTED: carrying n inside the
    # collect_list structs to delete this table and the sa/sb joins — one
    # tokenize pass, zero size joins — is ~30% SLOWER matched-load at sf0.1
    # (6.23 vs 4.84 s min-of-4 alternating): struct collect/sort plus the
    # (doc_a, doc_b, na, nb) grouping key tax the 1.3M-row pair exchange
    # more than the lazy second tokenize + two AQE-broadcast joins cost.
    # The simhash lesson again: measure, don't pattern-match.)
    sizes = (
        documents.select("doc_id", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size(F.col("ws")) >= 3)
        .select("doc_id", F.size(shingle_array(3)).alias("n"))
        .localCheckpoint(eager=False)
    )
    lists = (
        sh.groupBy("s")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_doc_freq))
    )
    pairs = lists.select(F.explode(pair_structs("ds")).alias("p")).select(
        "p.doc_a", "p.doc_b"
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("c"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    # no forced broadcast: `sizes` is one row PER CORPUS DOCUMENT, so a
    # forced broadcast is a driver/executor OOM at real corpus sizes —
    # AQE broadcasts it while small and degrades to a shuffle join when not
    # (the same policy as the MinHash verify joins)
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def neardup_containment(
    documents: DataFrame, threshold: float = 0.5, max_doc_freq: int = 1000
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs: C(A in B) = |A ∩ B| / |A|.

    Jaccard under-scores SUBSET duplication — a paragraph quoted inside a
    much longer document scores |A|/|B| ≈ 0 Jaccard however completely A is
    contained — so containment is the standard companion signal in
    training-data dedup (Broder 1997's "containment"; the quote/boilerplate
    case). Emits each undirected pair once (doc_a < doc_b) with BOTH directed
    scores; pairs qualify when either direction clears ``threshold``.

    Same exact pair-overlap core (and hot-shingle df-cap trade) as
    neardup_jaccard; count/count division is one exact IEEE op per cell on
    both engines, the 6-dp round is the face convention."""
    return (
        _pair_intersections(documents, max_doc_freq)
        .withColumn("cont_a_in_b", F.round(F.col("c") / F.col("na"), 6))
        .withColumn("cont_b_in_a", F.round(F.col("c") / F.col("nb"), 6))
        .filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
        .select("doc_a", "doc_b", "cont_a_in_b", "cont_b_in_a")
    )


NEARDUP_CONTAINMENT_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS s
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN cold ON cold.s = a.s
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / sa.n, 6) AS cont_a_in_b,
       round(c * 1.0 / sb.n, 6) AS cont_b_in_a
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE greatest(round(c * 1.0 / sa.n, 6), round(c * 1.0 / sb.n, 6)) >= 0.5
"""


NEARDUP_JACCARD_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS s
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- mirror of the Spark side's max_doc_freq=1000 hot-shingle cap: shingles
-- with document frequency above the cap are dropped from pair generation
-- (set sizes stay uncapped, matching neardup_jaccard exactly)
cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN cold ON cold.s = a.s
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(c * 1.0 / (sa.n + sb.n - c), 6) >= 0.2
"""


# shared CTE chain computing (node, component) over the exact Jaccard pair
# graph at threshold 0.4 — used by DEDUP_CLUSTERS_SQL and corpus.CLEAN_CORPUS_SQL
def jaccard_pairs_ctes(threshold: float = 0.4) -> str:
    """``words`` → ``pairs``: the exact-trigram-Jaccard pair chain as a
    WITH-body fragment (no leading ``WITH``), shared by every oracle that
    rides the near-dup pair graph — :data:`JACCARD_COMPONENTS_CTE` (and
    through it the dedup/corpus faces) and
    ``communities.label_prop_docs_sql`` — so the committed Jaccard math
    (hot-shingle cap, 6-dp rounding, the threshold comparison) lives in
    exactly ONE place. ``graph.pagerank_docs_sql`` predates this fragment
    and keeps its own byte-frozen copy of the same math (below-window
    oracle; fold it in when that face next rotates through the window)."""
    return f"""words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS s
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- mirror of the Spark side's max_doc_freq=1000 hot-shingle cap: shingles
-- with document frequency above the cap are dropped from pair generation
-- (set sizes stay uncapped, matching neardup_jaccard exactly)
cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= 1000),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  JOIN cold ON cold.s = a.s
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE round(c * 1.0 / (sa.n + sb.n - c), 6) >= {threshold}
)"""


JACCARD_COMPONENTS_CTE = "\nWITH RECURSIVE " + jaccard_pairs_ctes(0.4) + """,
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
-- transitive closure: every (node, reachable-node) pair; UNION (distinct)
-- terminates the recursion at the fixpoint. Fine at oracle scale; the Spark
-- side uses pointer-jumping label propagation instead.
reach AS (
  SELECT src AS node, src AS r FROM edges
  UNION
  SELECT rr.node, e.dst FROM reach rr JOIN edges e ON e.src = rr.r
),
comp AS (SELECT node, min(r) AS component FROM reach GROUP BY node)
"""

DEDUP_CLUSTERS_SQL = (
    JACCARD_COMPONENTS_CTE
    + """
SELECT component AS keep_doc_id, count(*) AS n_docs
FROM comp GROUP BY component
"""
)


def neardup_edit(
    documents: DataFrame, max_dist: int = 20, bucket_width: int | None = None
) -> DataFrame:
    """Blocked Levenshtein near-dup pairs: (doc_a, doc_b, dist) with
    dist <= ``max_dist`` edit operations between the full texts.

    Edit distance is the right signal for near-verbatim corruption —
    OCR noise, whitespace drift, small in-place edits — where shingle
    overlap is already ~1 and the question is HOW different two versions
    are. It is O(len_a * len_b) per pair, so all-pairs is never an option;
    blocking is the operator:

    - LENGTH blocking is lossless: |len_a - len_b| <= max_dist for any
      pair within max_dist, so bucketing by floor(n_chars / max_dist) and
      probing (b, b) and (b, b+1) covers every qualifying pair exactly.
    - FIRST-WORD blocking is the declared recall trade: only docs sharing
      their first whitespace token are compared (the sorted-neighborhood
      standard), which keeps bucket sizes near-constant on real corpora;
      versions that diverge in the first word are missed — route those
      through the MinHash path, which is edit-position-blind.

    Spark evaluates ``levenshtein(a, b, threshold)`` (early-exit banded DP,
    JVM codegen) and DuckDB plain ``levenshtein`` — identical values on
    every kept row, so the face is DuckDB-exact. Scale: the only shuffle is
    the block-key self-join; per-block pair counts are bounded by block
    population, and the threshold arg caps per-pair DP cost at
    O(max_dist * min_len).
    """
    w = bucket_width or max_dist
    if w < max_dist:
        raise ValueError("bucket_width < max_dist drops qualifying pairs")
    blocked = documents.select(
        "doc_id",
        "text",
        F.split(F.col("text"), " ").getItem(0).alias("w0"),
        (F.length("text") / w).cast("long").alias("bkt"),
    )
    # the bucket must be part of the EQUI-JOIN key, not a post-join filter:
    # joining on w0 alone materializes every same-first-word pair (quadratic
    # in the word's population — measured unbounded on a 10x replicated
    # corpus) before the length filter can prune. The left side probes
    # {bkt-1, bkt, bkt+1} via explode, so only same/adjacent-bucket pairs
    # ever leave the join; probes are distinct, so no pair is emitted twice,
    # and the doc_a < doc_b filter needs the full 3-probe span (a kept pair's
    # left row may sit one bucket above OR below its right row).
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"), "w0",
        F.explode(
            F.array(F.col("bkt") - 1, F.col("bkt"), F.col("bkt") + 1)
        ).alias("bkt"),
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"), "w0", "bkt"
    )
    # EXPLICIT-numPartitions repartition on the join keys: the join's input
    # BYTES are tiny relative to its CPU (levenshtein is O(len * max_dist)
    # per emitted pair), so AQE's size-based coalescing otherwise folds the
    # post-shuffle stage into ONE partition and serializes every DP call on
    # one core (measured: 5.1M candidate pairs -> 198 s single-task at the
    # 10x scale point). An explicit partition count is exempt from AQE
    # coalescing; hot (w0, bkt) blocks remain the skew caveat, as with any
    # blocking scheme.
    parts = documents.sparkSession.sparkContext.defaultParallelism
    cand = (
        a.repartition(parts, "w0", "bkt")
        .join(b.repartition(parts, "w0", "bkt"), ["w0", "bkt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    return (
        cand.withColumn("dist", F.levenshtein("ta", "tb", max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("doc_a", "doc_b", "dist")
    )


def _neardup_edit_sql(max_dist: int = 20, bucket_width: int | None = None) -> str:
    """Oracle generated from the SAME parameters as neardup_edit (the
    _ppl_filter_sql pattern) so face and oracle cannot drift."""
    w = bucket_width or max_dist
    return f"""
WITH blocked AS (
  SELECT doc_id, text, split_part(text, ' ', 1) AS w0,
         CAST(floor(length(text) / {w}.0) AS BIGINT) AS bkt
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.text, b.text) AS dist
FROM blocked a JOIN blocked b
  ON a.w0 = b.w0 AND a.doc_id < b.doc_id AND abs(a.bkt - b.bkt) <= 1
WHERE levenshtein(a.text, b.text) <= {max_dist}
"""


NEARDUP_EDIT_SQL = _neardup_edit_sql()


def band_key_structs(num_hashes: int, bands: int) -> Column:
    """LSH band keys from signature columns ``mh0..mh{num_hashes-1}``: an
    array of (band, bkey) structs, where bkey is the band's signature slice
    joined as a string — an exact (collision-free) bucket id that any engine
    reproduces, vs. hashing the slice with engine-specific xxhash64.

    The SINGLE definition of the banding convention: the batch operator
    (minhash_lsh_pairs) and the streaming reference index + per-row
    signature (streaming.neardup) must produce identical keys, or streamed
    docs silently stop colliding with batch-built buckets.
    """
    rows_per_band = num_hashes // bands
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("bkey"),
            )
            for b in range(bands)
        ]
    )


def _minhash_signatures_from(sh: DataFrame, num_hashes: int) -> DataFrame:
    from baum_welch_spark.functions.columns import portable_hash60

    # hoist the base hash out of the aggregates: computed once per shingle,
    # not once per (shingle, k) — Catalyst doesn't CSE across agg expressions.
    # portable_hash60 (not xxhash64) so signatures are engine-reproducible
    # and the LSH operator gets a DuckDB-exact oracle (MINHASH_LSH_SQL).
    hashed = sh.withColumn("h", F.pmod(portable_hash60("s"), F.lit(MERSENNE_P)))
    mins = [
        F.min((F.col("h") * F.lit(2 * k + 1) + F.lit(k * k + 7)) % F.lit(MERSENNE_P)).alias(f"mh{k}")
        for k in range(num_hashes)
    ]
    return hashed.groupBy("doc_id").agg(*mins)


def minhash_signatures(documents: DataFrame, num_hashes: int = 32) -> DataFrame:
    """MinHash signatures over word-trigram shingles, entirely in Catalyst:
    base hash = xxhash64(shingle), permutation k = (a_k*h + b_k) mod 2^31-1,
    signature component k = min over the doc's shingles.

    Deterministic coefficients derived from k (odd multipliers), so the
    operator needs no driver-side randomness.
    """
    return _minhash_signatures_from(_shingles(documents), num_hashes)


def minhash_lsh_pairs(
    documents: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float = 0.2,
) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified with exact Jaccard.

    band key = hash of the band's signature slice; candidate pairs share at
    least one band bucket; candidates are then verified against the exact
    trigram Jaccard (so the output is exact over an approximate candidate
    set — the standard 100 TB recipe where the all-pairs join is infeasible).
    """
    sh = _shingles(documents)
    sig = _minhash_signatures_from(sh, num_hashes)
    band_cols = band_key_structs(num_hashes, bands)
    banded = sig.select("doc_id", F.explode(band_cols).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    # materialize the (doc_id, band, bkey) table once (guide §3.3): it feeds
    # BOTH self-join sides, which otherwise re-run the whole
    # shingle-explode + 32-hash signature aggregation twice (the dominant
    # cost of the operator); the banded table is id+two-ints per (doc, band)
    # — decision-sized, never text-sized
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # candidate id-pairs feed three consumers (cand_docs via the union, and
    # the verify join) — materialize once, id-only rows
    candidates = candidates.localCheckpoint(eager=False)
    # verify ONLY the candidate pairs: shingle sets of candidate docs are
    # semi-join-pruned, collected per doc, and compared with array_intersect.
    # The full all-pairs shingle join never runs — that's the 100 TB point.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # prune documents to candidates BEFORE shingling: the verify path then
    # re-shingles only the handful of candidate docs instead of the corpus
    # (id-only join side; AQE broadcasts it while small, shuffles if not)
    sets = (
        _shingles(documents.join(cand_docs, "doc_id"))
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("shingles"))
    )
    # no forced broadcast on the verify joins: Catalyst/AQE broadcasts the
    # candidate-set side while it is small and degrades to a shuffle join if
    # a pathological candidate explosion makes it big — a forced F.broadcast
    # here would turn that failure mode into an executor OOM instead
    # (VERDICT r1 item 8; both regimes covered by tests/test_operators.py)
    return (
        candidates.join(
            sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")),
            "doc_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")),
            "doc_b",
        )
        .withColumn("c", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.size("sh_a") + F.size("sh_b") - F.col("c")), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = 12) -> DataFrame:
    """SimHash near-dup: 60-bit signature from word unigram hashes, banded
    into 4 x 15-bit chunks for the candidate join (pigeonhole: hamming <= 3
    guarantees a shared chunk; larger radii trade recall), hamming distance
    verified with bit_count(xor).

    The unigram hash is portable_hash60 (engine-agnostic MD5 bits, not
    xxhash64), so the whole operator — signatures, banding, hamming — has a
    DuckDB-exact oracle (SIMHASH_SQL) instead of a rows-only check.
    """
    from baum_welch_spark.functions.columns import portable_hash60

    word = documents.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " "))).alias("w")
    )
    h = portable_hash60("w")
    bit_sums = [
        F.sum(F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{b}")
        for b in range(60)
    ]
    agg = word.groupBy("doc_id").agg(*bit_sums)
    sig_expr = None
    for b in range(60):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        sig_expr = term if sig_expr is None else sig_expr.bitwiseOR(term)
    # NOT checkpointed (r14 optimization round, measured): although `chunks`
    # feeds both self-join sides, AQE's runtime exchange reuse already
    # dedupes the signature aggregate's exchange — an explicit
    # localCheckpoint here measured 0.6 s SLOWER (5.3 vs 4.7 isolated
    # min-of-3) by adding a materialization barrier for no saved work
    sig = agg.select("doc_id", sig_expr.alias("sig"))
    chunks = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("chunk"),
                         F.shiftright(F.col("sig"), 15 * c).bitwiseAND(F.lit(0x7FFF)).alias("ckey"))
                for c in range(4)
            ])
        ).alias("ck"),
    ).select("doc_id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.ckey").alias("ckey"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# exact oracles for the hash-based near-dup ops: possible because the base
# hash is portable_hash60 (MD5 bits), which DuckDB reproduces verbatim as
# ('0x' || substr(md5(x), 1, 15))::BIGINT. Parameters mirror the driver faces.

MINHASH_LSH_SQL = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS s
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
),
hashed AS (
  SELECT doc_id, s, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h FROM sh
),
mins AS (
  SELECT doc_id, k, min((h * (2*k + 1) + k*k + 7) % 2147483647) AS mh
  FROM hashed, unnest(generate_series(0, 31)) AS t(k)
  GROUP BY doc_id, k
),
bands AS (
  SELECT doc_id, (k // 4) AS band, string_agg(mh::VARCHAR, '_' ORDER BY k) AS bkey
  FROM mins GROUP BY doc_id, (k // 4)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS c
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) >= 0.2
"""

SIMHASH_SQL = """
WITH words AS (
  SELECT DISTINCT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents) u
),
hashed AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM words),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) > 0
              THEN 1 ELSE 0 END AS bit
  FROM hashed, unnest(generate_series(0, 59)) AS t(b)
  GROUP BY doc_id, b
),
sig AS (SELECT doc_id, sum(bit::BIGINT << b)::BIGINT AS sig FROM bits GROUP BY doc_id),
chunks AS (
  SELECT doc_id, sig, c, (sig >> (15 * c)) & 32767 AS ckey
  FROM sig, unnest(generate_series(0, 3)) AS t(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sa, b.sig AS sb
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INTEGER AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 12
"""


def connected_components(pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
                         max_iter: int = 20) -> DataFrame:
    """Cluster near-dup PAIRS into dedup groups: (node, component) where
    component = min node id reachable from the node.

    The pipeline step after any pair-producing dedup op (Jaccard / MinHash /
    SimHash / cosine): groups, not pairs, are what a dedup job acts on
    (keep one doc per component).

    Algorithm: min-label propagation with pointer jumping — each round every
    node adopts min(own label, neighbors' labels, label[label]). The
    label-of-label jump doubles the propagation distance per round, so a
    chain of diameter d converges in O(log d) rounds instead of d (the
    large-star/small-star idea in label form — ADVICE r1). Per round: two
    joins + one groupBy min, all plain shuffles on node id, AQE-coalesced;
    label state is 2 columns per node. Spark-first alternative to GraphX
    (JVM-RDD) and to driver-side union-find (all edges on one machine).

    Each round's labels are localCheckpoint()ed: an iterative plan that
    feeds its own output back in otherwise grows an unbounded lineage tree
    that OOMs the DRIVER during planning (observed at ~30 rounds of the
    round-1 implementation) — the classic iterative-Spark trap. On a real
    cluster prefer ``spark.sparkContext.setCheckpointDir`` + ``checkpoint``
    for fault tolerance; localCheckpoint trades that for speed.
    """
    # persist the pair source first: the two union branches would otherwise
    # re-execute the (potentially expensive) pair-producing plan twice.
    # If the CALLER already persisted it, leave their cache alone (don't
    # evict it on the way out).
    caller_persisted = pairs.storageLevel.useMemory or pairs.storageLevel.useDisk
    if not caller_persisted:
        pairs = pairs.persist()
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    try:
        changed = 1
        for _ in range(max_iter):
            # candidate labels flowing along edges this round
            neighbor_min = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("component").alias("n_comp"))
            )
            # carry the pre-round label through as `prev`: labels only ever
            # DECREASE, so "did this round change anything" is exactly
            # component != prev on the new frame — a filter over the
            # just-checkpointed blocks instead of the old node-sized
            # new-vs-old shuffle JOIN that ran as its own 2-exchange job
            # every round (guide §1.4 job accounting; r14 A/B: the join job
            # was ~0.1-0.2 s per round on label frames of any size, and at
            # 100 TB it shuffled two corpus-sized label tables per round)
            cand = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.col("component").alias("prev"),
                    F.least(
                        F.col("component"), F.coalesce(F.col("n_comp"), F.col("component"))
                    ).alias("component"),
                )
                .persist()
            )
            # pointer jump: fold in label[label[node]] — component values are
            # node ids, so a self-join resolves them one more hop
            jump = cand.select(
                F.col("node").alias("jnode"), F.col("component").alias("jcomp")
            )
            new_full = (
                cand.join(jump, cand.component == jump.jnode, "left")
                .select(
                    "node",
                    "prev",
                    F.least(
                        F.col("component"), F.coalesce(F.col("jcomp"), F.col("component"))
                    ).alias("component"),
                )
                .localCheckpoint()  # eager: truncates lineage AND materializes
            )
            cand.unpersist()
            changed = (
                new_full.filter(F.col("component") != F.col("prev")).limit(1).count()
            )
            # free the previous round's checkpointed blocks now that the
            # convergence check has consumed them — otherwise every round's
            # node-sized labels stay resident until session end (only the
            # final, returned labels remain checkpointed)
            labels.unpersist()
            labels = new_full
            if changed == 0:
                break
        if changed != 0:
            # not at a fixpoint — returning silently would report one real
            # cluster as several (ADVICE r1)
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} rounds "
                "(needs ~log2(graph diameter) rounds); raise max_iter"
            )
        return labels.select("node", "component")
    finally:
        edges.unpersist()
        if not caller_persisted:
            pairs.unpersist()


def dedup_clusters_jaccard(documents: DataFrame, threshold: float = 0.4) -> DataFrame:
    """End-to-end dedup grouping: exact Jaccard pairs -> connected
    components -> (component, n_docs, keep_doc_id). DuckDB-exact in the
    driver contract (recursive-CTE transitive closure oracle); component
    semantics are additionally tested against a Python union-find oracle."""
    pairs = neardup_jaccard(documents, threshold=threshold)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("node").alias("keep_doc_id"))
        .select("keep_doc_id", "n_docs")
        .orderBy("keep_doc_id")
    )


def canonical_docs(
    documents: DataFrame, threshold: float = 0.4, pair_generator=None
) -> DataFrame:
    """Quality-aware canonical selection per near-dup cluster: instead of
    ``dedup_clusters_jaccard``'s keep-min-id policy, each connected
    component keeps its HIGHEST-quality member (``text.doc_quality`` score,
    tiebreak doc_id asc) — what a production dedup actually ships: drop the
    duplicates, keep the best-written copy.

    Plan: pairs -> components (both audited operators), then one
    component-count-sized join to the quality scores and a per-component
    window over cluster members (cluster-sized partitions — the window
    never sees the corpus).

    ``pair_generator`` follows the ``clean_corpus`` convention: ``None``
    uses exact trigram Jaccard for oracle parity (scale ceiling: the
    all-pairs-flavored shingle join — measured 6.1x wall for 10x on an
    adversarially duplicated corpus); pass
    ``lambda docs: minhash_lsh_pairs(docs)[...]`` for the banded 100 TB
    path.

    Output: (component, keep_doc_id, quality_score, n_docs).
    """
    from baum_welch_spark.operators.text import doc_quality

    if pair_generator is None:
        pairs = neardup_jaccard(documents, threshold=threshold)
    else:
        pairs = pair_generator(documents)
    comp = connected_components(pairs)
    q = doc_quality(documents).select("doc_id", "quality_score")
    members = comp.join(q, comp.node == q.doc_id).select(
        "component", "node", "quality_score"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality_score"), F.asc("node")
    )
    return (
        members.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_docs",
            F.count(F.lit(1)).over(Window.partitionBy("component")).cast("bigint"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "component",
            F.col("node").alias("keep_doc_id"),
            "quality_score",
            "n_docs",
        )
        .orderBy("component")
    )


def _canonical_docs_sql() -> str:
    from baum_welch_spark.operators.text import STOPWORDS

    stop = ", ".join("'" + s + "'" for s in STOPWORDS)
    return (
        JACCARD_COMPONENTS_CTE
        + f""",
q AS (
  SELECT doc_id,
         round(CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END
               + CASE WHEN len(list_filter(string_split(lower(text), ' '),
                         x -> x IN ({stop})))
                      * 1.0 / len(string_split(lower(text), ' ')) > 0.02
                      THEN 0.5 ELSE 0.0 END, 1) AS quality_score
  FROM documents
),
members AS (
  SELECT c.component, c.node, q.quality_score,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality_score DESC, c.node ASC) AS rk,
         count(*) OVER (PARTITION BY c.component) AS n_docs
  FROM comp c JOIN q ON c.node = q.doc_id
)
SELECT component, node AS keep_doc_id, quality_score, n_docs
FROM members WHERE rk = 1 ORDER BY component
"""
    )


def banded_signatures(
    documents: DataFrame, num_hashes: int = 32, bands: int = 8, k: int = 3
) -> DataFrame:
    """The (doc_id, band, bkey) banded MinHash frame — THE index to persist
    for incremental dedup: write it partitioned however the corpus is
    organized, append each ingested batch's rows, and every later batch
    dedups against it without touching base text (except the few verify
    candidates). Shared by the streaming reference index
    (streaming.neardup.build_reference_index calls this) and the
    incremental cross-corpus path; the batch self-join operator
    (minhash_lsh_pairs) keeps its pre-existing inline spelling — its face
    hash is pinned below the driver window — with equivalence enforced by
    tests/test_operators.py::test_minhash_batch_operator_banding_matches_banded_signatures
    (candidates from these buckets, exactly verified, must equal the
    operator's output)."""
    sig = _minhash_signatures_from(_shingles(documents, k=k), num_hashes)
    return sig.select(
        "doc_id", F.explode(band_key_structs(num_hashes, bands)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    base_docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float = 0.2,
    base_index: DataFrame | None = None,
) -> DataFrame:
    """Near-dups of an INCOMING document batch against an EXISTING corpus —
    the incremental crawl-dedup shape (r9): every recurring ingestion
    pipeline dedups each new crawl against everything already kept, and
    re-running the full-corpus self-join per batch is the one thing that
    cannot scale. Per-batch cost here is O(|new|) signature work plus a
    band-bucket equi-join against the base's banded signatures; the base
    side is derived in-plan at demo scale, but at 100 TB it is the
    PRECOMPUTED, stored signature index (``minhash_signatures`` +
    ``band_key_structs`` give exactly the frame to persist) — the new
    batch never touches base text except for the few verify candidates.

    Same exact-over-candidates recipe as :func:`minhash_lsh_pairs`,
    restricted to cross-corpus pairs: candidates collide in at least one
    band bucket with one side in each corpus; exact trigram Jaccard is
    computed for candidates only. Output: (doc_new, doc_base, jaccard)
    with jaccard >= ``verify_threshold``. Corpora with overlapping ids are
    fine (same-id pairs are excluded; they are re-ingestions, not
    near-dups).

    ``base_index``: a previously persisted :func:`banded_signatures` frame
    for the base corpus (same num_hashes/bands) — pass it to skip deriving
    the base's signatures in-plan, which is the point at scale: the index
    is computed once per ingested batch, never per query. ``base_docs`` is
    still required (candidate verification reads the candidates' text).
    A supplied index is VALIDATED against the banding parameters: because
    :func:`banded_signatures` emits EVERY ordinal ``0..bands-1`` for every
    document, a non-empty well-formed index always carries exactly
    ``bands`` distinct band ordinals — so the check is one bounded-result
    ``count_distinct(band)`` aggregate that must return 0 (legitimately
    EMPTY index: empty base corpus, passes and simply yields no pairs) or
    exactly ``bands``. Both a WIDER banding (more bands than ``bands``)
    and a NARROWER one (fewer — which the old max-ordinal check could not
    see, e.g. built with bands=8 but called with bands=16) are rejected;
    either mismatch would otherwise produce few or no collisions and
    silently declare the batch duplicate-free, the exact hazard the
    streaming reference index documents. ``num_hashes`` drift is not
    observable from the index shape, so persist (num_hashes, bands)
    alongside the index and rebuild on mismatch.
    """
    if base_index is not None:
        chk = base_index.agg(
            F.count_distinct("band").alias("nb"), F.max("band").alias("hi")
        ).first()
        # both predicates, one bounded aggregate: the distinct count catches
        # a NARROWER banding (built with fewer bands), the max-ordinal bound
        # catches shifted/filtered indexes whose distinct count happens to
        # equal `bands` but whose ordinals are out of range (review r11)
        if chk.nb not in (0, bands) or (chk.hi is not None and chk.hi >= bands):
            raise ValueError(
                f"base_index carries {chk.nb} distinct band ordinals "
                f"(max {chk.hi}) but the banding parameters say bands={bands} "
                "— it was built under a different (num_hashes, bands); "
                "rebuild it with banded_signatures(base_docs, num_hashes, bands)"
            )
    a = banded_signatures(new_docs, num_hashes, bands).alias("a")
    b = (
        base_index if base_index is not None else banded_signatures(base_docs, num_hashes, bands)
    ).alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_new"), F.col("b.doc_id").alias("doc_base"))
        .distinct()
        # materialized once (r14 optimization round, guide §3.3): three
        # consumers (both cand_sets prunes + the final verify join) each
        # re-expanded BOTH banded-signature pipelines — 16 parquet scans in
        # the static plan; the id-pair frame is candidate-sized (tiny by
        # LSH construction), so checkpointing it truncates all three
        .localCheckpoint(eager=False)
    )

    def cand_sets(docs: DataFrame, ids: DataFrame) -> DataFrame:
        # prune to candidates BEFORE re-shingling: the verify path touches
        # only candidate docs' text (id-only join side; AQE broadcasts it
        # while small) — same policy as minhash_lsh_pairs
        return (
            _shingles(docs.join(ids.distinct(), "doc_id"))
            .groupBy("doc_id")
            .agg(F.collect_set("s").alias("shingles"))
        )

    sets_new = cand_sets(new_docs, candidates.select(F.col("doc_new").alias("doc_id")))
    sets_base = cand_sets(base_docs, candidates.select(F.col("doc_base").alias("doc_id")))
    return (
        candidates.join(
            sets_new.select(F.col("doc_id").alias("doc_new"), F.col("shingles").alias("sh_n")),
            "doc_new",
        )
        .join(
            sets_base.select(F.col("doc_id").alias("doc_base"), F.col("shingles").alias("sh_b")),
            "doc_base",
        )
        .withColumn("c", F.size(F.array_intersect("sh_n", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.size("sh_n") + F.size("sh_b") - F.col("c")), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_new", "doc_base", "jaccard")
    )


# DuckDB oracle for the driver face: new = hash_split(documents, "doc_id",
# [0.1, 0.9], seed=11)[0] (sampling._keyed_hash convention: portable MD5 of
# "id:seed" mod 1e6 under 100000), base = the rest; then the exact mirror of
# MINHASH_LSH_SQL with per-side shingle/signature/band CTEs and candidates
# requiring one side in each corpus.
MINHASH_INCREMENTAL_SQL = """
WITH tagged AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(doc_id::VARCHAR || ':11'), 1, 15))::BIGINT
           % 1000000 < 100000 AS is_new
  FROM documents
),
words AS (
  SELECT doc_id, is_new, string_split(text, ' ') AS ws FROM tagged
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, is_new, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS s
  FROM words, unnest(generate_series(1, len(ws) - 2)) AS t(g)
),
hashed AS (
  SELECT doc_id, is_new, ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h FROM sh
),
mins AS (
  SELECT doc_id, is_new, k, min((h * (2*k + 1) + k*k + 7) % 2147483647) AS mh
  FROM hashed, unnest(generate_series(0, 31)) AS t(k)
  GROUP BY doc_id, is_new, k
),
bands AS (
  SELECT doc_id, is_new, (k // 4) AS band,
         string_agg(mh::VARCHAR, '_' ORDER BY k) AS bkey
  FROM mins GROUP BY doc_id, is_new, (k // 4)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_base
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.is_new AND NOT b.is_new
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_new, c.doc_base, count(*) AS c
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_new
  JOIN sh y ON y.doc_id = c.doc_base AND y.s = x.s
  GROUP BY 1, 2
)
SELECT i.doc_new, i.doc_base, round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_new = sa.doc_id
JOIN sizes sb ON i.doc_base = sb.doc_id
WHERE round(i.c * 1.0 / (sa.n + sb.n - i.c), 6) >= 0.2
"""


#: 2^60 — the portable_hash60 value space; split cutoffs are integer
#: fractions of it so Spark and DuckDB compare the same BIGINT (no
#: float-division edge cases at the split boundaries)
_HASH60_SPACE = 1 << 60


def leakage_safe_split(
    documents: DataFrame,
    train: float = 0.8,
    valid: float = 0.1,
    threshold: float = 0.4,
    pair_generator=None,
    salt: str = "split",
    components: DataFrame | None = None,
) -> DataFrame:
    """Near-dup-aware train/valid/test assignment: every document in the
    same near-dup CLUSTER lands in the same split, so no near-duplicate of
    a training document can leak into valid/test (the contamination a
    doc_id-hash split cannot prevent — the reference has no notion of this;
    beyond-reference training-pipeline surface, same family as
    ``clean_corpus``/``decontaminate``).

    Assignment is by a portable 60-bit hash of (salt, cluster
    representative): deterministic across engines AND across runs, stable
    under corpus growth (a new document joins an existing cluster's split
    rather than reshuffling anything), and tunable per experiment via
    ``salt``. Cutoffs are INTEGER fractions of the hash space, so the
    boundary comparison is BIGINT-exact in both Spark and the DuckDB oracle
    (``leakage_split_sql``) — no float-division drift.

    Plan shape: pair generation (exact trigram Jaccard by default for
    oracle parity; pass ``pair_generator=lambda d: minhash_lsh_pairs(d)
    .select("doc_a", "doc_b")`` for the banded 100 TB path, the
    ``clean_corpus`` convention) -> pointer-jumping connected components
    (O(log diameter) rounds, id-only shuffles) -> ONE left join of the
    corpus against the component labels (clustered docs only — singletons
    coalesce to their own id without shuffling anything extra) -> pure
    codegen hash + CASE. The corpus-sized side shuffles once, on doc_id.

    Output: (doc_id, component, split) — component is the cluster
    representative (min doc_id; the doc's own id for singletons).
    """
    if not (0.0 < train and 0.0 <= valid and train + valid < 1.0):
        raise ValueError(
            f"need 0 < train and 0 <= valid and train + valid < 1 to leave "
            f"test mass; got train={train}, valid={valid}"
        )
    if components is not None:
        # precomputed (node, component) frame over the same pair definition
        # — a pipeline that already clustered (prepare_training_corpus)
        # shares ONE components pass between dedup and split stages
        comp = components
    else:
        if pair_generator is None:
            pairs = neardup_jaccard(documents, threshold=threshold)
        else:
            pairs = pair_generator(documents)
        comp = connected_components(pairs)
    labelled = (
        documents.select("doc_id")
        .join(comp, documents.doc_id == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
        )
    )
    return labelled.select(
        "doc_id",
        "component",
        split_label_col(F.col("component"), train, valid, salt).alias("split"),
    ).orderBy("doc_id")


def split_label_col(component, train: float, valid: float, salt: str):
    """The salted 60-bit split-assignment expression as a Column over a
    component id — the single source of truth shared by
    :func:`leakage_safe_split` and ``prepare_training_corpus`` (r15: the
    pipeline computes the label inline on its already-joined component
    column instead of joining a separately-scanned splits table —
    bit-identical values because it is literally the same expression)."""
    from baum_welch_spark.functions.columns import portable_hash60

    cut_train = int(train * _HASH60_SPACE)
    cut_valid = int((train + valid) * _HASH60_SPACE)
    h = portable_hash60(F.concat(F.lit(salt + ":"), component.cast("string")))
    return (
        F.when(h < F.lit(cut_train), F.lit("train"))
        .when(h < F.lit(cut_valid), F.lit("valid"))
        .otherwise(F.lit("test"))
    )


def leakage_split_sql(
    train: float = 0.8, valid: float = 0.1, salt: str = "split"
) -> str:
    """DuckDB-exact oracle for :func:`leakage_safe_split` at the default
    exact-Jaccard pair generator: the shared transitive-closure CTE
    (JACCARD_COMPONENTS_CTE) plus the same salted 60-bit md5 hash and the
    same integer cutoffs."""
    cut_train = int(train * _HASH60_SPACE)
    cut_valid = int((train + valid) * _HASH60_SPACE)
    return (
        JACCARD_COMPONENTS_CTE
        + f"""
SELECT d.doc_id,
       COALESCE(c.component, d.doc_id) AS component,
       CASE WHEN ('0x' || substr(md5('{salt}:' ||
                  COALESCE(c.component, d.doc_id)::VARCHAR), 1, 15))::BIGINT
                 < {cut_train} THEN 'train'
            WHEN ('0x' || substr(md5('{salt}:' ||
                  COALESCE(c.component, d.doc_id)::VARCHAR), 1, 15))::BIGINT
                 < {cut_valid} THEN 'valid'
            ELSE 'test' END AS split
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
ORDER BY d.doc_id
"""
    )
