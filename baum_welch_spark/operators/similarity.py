"""Similarity search over the ``embeddings`` table (north-star §2.7).

  * knn_brute    — exact cosine top-k, pure Catalyst (zip_with + aggregate
                   fold in double precision, JVM-side, no UDF), query side
                   broadcast. The correctness baseline.
  * knn_ivf      — IVF-style approximate top-k: coarse centroids via
                   deterministic hash-partition ("random projection sign
                   buckets"), probe the query's bucket only. The scale path:
                   the candidate join touches 1/2^bits of the corpus.
  * emb_norms    — per-vector L2 norm / dim sanity projection.

Scale notes: brute-force is O(Q x N) — fine for Q small whatever N is, as
the corpus side never shuffles (the query side broadcasts). For N-to-N
all-pairs at 100 TB use the IVF bucketing (equi-join on bucket id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from baum_welch_spark.functions.columns import as_double_array as _as_double
from baum_welch_spark.functions.columns import dot as _dot
from baum_welch_spark.functions.columns import l2_norm as _norm


def emb_norms(embeddings: DataFrame) -> DataFrame:
    v = _as_double(F.col("embedding"))
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(_norm(v), 6).alias("l2_norm"),
    )


EMB_NORMS_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
FROM embeddings
"""


def knn_brute(embeddings: DataFrame, n_queries: int = 5, k: int = 5) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries, candidates = the rest.

    The small query side is broadcast, so the corpus scan is shuffle-free;
    ranking is a per-query window (tiny: Q x N rows reduced to Q x k).
    Deterministic tiebreak on (cos desc, vec_id asc) after rounding, so ulp
    noise cannot reorder the oracle comparison.
    """
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), _as_double(F.col("embedding")).alias("qv")
    )
    c = embeddings.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), _as_double(F.col("embedding")).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "q_id",
        "c_id",
        (F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6) + F.lit(0.0)).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )


KNN_IVF_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
-- sign-of-projection buckets for the two deterministic +/-1 directions
-- (sign = ((i+1)*(b+1)) % 3 < 2 with 0-based i; DuckDB lambda index is
-- 1-based so it reads (i*(b+1)) % 3). Mirrors knn_ivf's bucket() exactly.
bucketed AS (
  SELECT vec_id, v,
         (CASE WHEN list_sum(list_transform(v,
             (x, i) -> x * (CASE WHEN (i * 1) % 3 < 2 THEN 1.0 ELSE -1.0 END))) > 0
           THEN 1 ELSE 0 END)
       + (CASE WHEN list_sum(list_transform(v,
             (x, i) -> x * (CASE WHEN (i * 2) % 3 < 2 THEN 1.0 ELSE -1.0 END))) > 0
           THEN 2 ELSE 0 END) AS bucket
  FROM v
),
q AS (SELECT vec_id AS q_id, v AS qv, bucket FROM bucketed WHERE vec_id < 5),
c AS (SELECT vec_id AS c_id, v AS cv, bucket FROM bucketed WHERE vec_id >= 5),
scored AS (
  SELECT q_id, c_id,
         round(list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6) + 0.0 AS cos
  FROM c JOIN q USING (bucket)
),
ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rk
  FROM scored
)
SELECT q_id, c_id, cos, rk FROM ranked WHERE rk <= 5
"""

def knn_split_ctes(n_queries: int) -> str:
    """``q``/``c``: the query-vs-candidate corpus split as a WITH-body
    fragment for the given boundary — one copy shared by
    :data:`KNN_BRUTE_SQL` and ``fusion.hybrid_search_sql``."""
    return f"""q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {n_queries}
),
c AS (
  SELECT vec_id AS c_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= {n_queries}
)"""


#: the rounded (+0.0 signed-zero-normalized) cosine over the qv/cv aliases —
#: one copy of the committed cosine math, shared with the fusion oracle
#: (KNN_IVF_SQL above predates this constant and keeps its byte-frozen
#: below-window copy of the same text; fold it in when that face rotates)
COSINE_QC_SQL_EXPR = """round(list_sum(list_transform(list_zip(qv, cv), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                  * sqrt(list_sum(list_transform(cv, x -> x * x)))), 6) + 0.0 AS cos"""


KNN_BRUTE_SQL = f"""
WITH {knn_split_ctes(5)},
scored AS (
  SELECT q_id, c_id,
         {COSINE_QC_SQL_EXPR}
  FROM c, q
),
ranked AS (
  SELECT q_id, c_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id ASC) AS rk
  FROM scored
)
SELECT q_id, c_id, cos, rk FROM ranked WHERE rk <= 5
"""


def cosine_neardup(embeddings: DataFrame, threshold: float = 0.35, n_blocks: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: all (a < b) with
    cos(a, b) >= threshold (north-star dedup suite, SURVEY §2.7).

    Physical strategy: block-matrix join. Each vector hashes to one of
    ``n_blocks`` row-blocks (xxhash64 — deterministic, balanced); every
    unordered block pair (p <= q) is one shuffle group, and a grouped
    Arrow UDF computes ``block_p @ block_q.T`` as a single float64 GEMM,
    emitting only the pairs over threshold. Every {a, b} pair lands in
    exactly one group — (min(block_a, block_b), max(...)) — so no dedup
    pass is needed.

    Scale shape: NOTHING is resident on the driver and no side is
    broadcast — this is the fix for round-1's driver-side ``toPandas()``
    (VERDICT "What's wrong" #3). Shuffle volume is O(n * n_blocks * d)
    (each row is replicated to its n_blocks block pairs); per-task memory
    is O(2 * (n / n_blocks) * d * 8B), so n_blocks tunes the
    shuffle-vs-memory trade: at 1e6 x 256d, n_blocks=32 keeps each group
    ~512 MB of replicated shuffle but only ~130 MB resident per task.
    The O(n^2 * d) GEMM work itself is unavoidable for an exact answer —
    past ~1e6 vectors use :func:`cosine_neardup_lsh`, which verifies an
    LSH candidate set instead of all pairs.
    """
    import numpy as np
    import pandas as pd

    nb = int(n_blocks)
    src = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        F.pmod(F.xxhash64("vec_id"), F.lit(nb)).cast("int").alias("blk"),
    )
    # replicate each row to every block pair it participates in:
    # pid(p, q) = p * nb + q for p = min(blk, other), q = max(blk, other)
    others = F.sequence(F.lit(0), F.lit(nb - 1))
    pids = F.array_distinct(
        F.transform(
            others,
            lambda o: F.least(F.col("blk"), o) * nb + F.greatest(F.col("blk"), o),
        )
    )
    exploded = src.withColumn("pid", F.explode(pids))

    def gemm_group(key, pdf):
        pid = int(key[0])
        p, q = pid // nb, pid % nb
        ids = pdf["vec_id"].to_numpy()
        blks = pdf["blk"].to_numpy()
        M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        # zero-norm rows: normalize to the zero vector (cos 0 with
        # everything -> never paired), matching the SQL oracle's NULL-drop
        # on division by a zero norm, instead of NaN-poisoning the GEMM
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0.0] = np.inf
        U = M / nrm
        if p == q:
            cos = np.round(U @ U.T, 6)
            mask = (cos >= threshold) & (ids[:, None] < ids[None, :])
            r, c = np.nonzero(mask)
            return pd.DataFrame({"vec_a": ids[r], "vec_b": ids[c], "cos": cos[r, c]})
        lm, rm = blks == p, blks == q
        lids, rids = ids[lm], ids[rm]
        cos = np.round(U[lm] @ U[rm].T, 6)
        mask = cos >= threshold
        r, c = np.nonzero(mask)
        a, b = lids[r], rids[c]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"vec_a": lo, "vec_b": hi, "cos": cos[r, c]})

    return exploded.groupBy("pid").applyInPandas(
        gemm_group, schema="vec_a bigint, vec_b bigint, cos double"
    )


COSINE_NEARDUP_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
             / (a.nrm * b.nrm), 6) AS cos
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
            / (a.nrm * b.nrm), 6) >= 0.35
"""


def _lsh_sign_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """±1 Rademacher hyperplanes: sign of plane p at component i = bit
    (p % 60) of the portable 60-bit md5 hash of the plane's GROUP-salted
    component index — group g = p // 60 hashes str(i) for g = 0 (the
    historical planes, bit-identical to the pre-extension matrix) and
    f"{g}:{i}" for g > 0, so the plane budget is unbounded while every
    committed face hash is preserved. Any engine reproduces it — DuckDB:
    (('0x' || substr(md5(<salted i>), 1, 15))::BIGINT >> (p % 60)) & 1.
    The scale rule this serves (SURVEY §8.3g): expected bucket size is
    n / 2^bits, so bits must grow ~log2(n) to keep candidate mass linear —
    a 1e9-vector corpus at 30 bits x 8 tables needs 240 planes."""
    import hashlib

    def group_hashes(g: int) -> list[int]:
        salt = "" if g == 0 else f"{g}:"
        return [
            int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)
            for i in range(dim)
        ]

    hs_by_group = [group_hashes(g) for g in range((n_planes + 59) // 60)]
    return [
        [1.0 if (h >> (p % 60)) & 1 else -1.0 for h in hs_by_group[p // 60]]
        for p in range(n_planes)
    ]


def cosine_lsh_oracle_sql(
    threshold: float = 0.35, bits: int = 4, tables: int = 8, dim: int = 64
) -> str:
    """DuckDB-exact oracle for cosine_neardup_lsh: same md5-derived planes
    (recomputed in SQL from md5(i)), same bucket keys, same exact-cosine
    verify at 6-decimal rounding.

    ``dim`` must match the corpus's embedding width (the testdata tables are
    64-wide at every sf) — DuckDB 1.0's generate_series only takes constants,
    so the dimension is baked into the generated SQL rather than read from
    the data."""
    n_planes = tables * bits

    def plane_bit(t: int, b: int) -> str:
        p = t * bits + b
        proj = f"list_sum(list_transform(list_zip(v, sl{p}), x -> x[1] * x[2]))"
        return f"(CASE WHEN {proj} > 0 THEN {1 << b} ELSE 0 END)"

    sign_lists = ",\n".join(
        f"s{p} (sl{p}) AS (SELECT list(CASE WHEN (h >> {p % 60}) & 1 = 1 "
        f"THEN 1.0 ELSE -1.0 END ORDER BY i) FROM hs WHERE g = {p // 60})"
        for p in range(n_planes)
    )
    sign_tables = ", ".join(f"s{p}" for p in range(n_planes))
    keys = ",\n         ".join(
        "(" + " + ".join(plane_bit(t, b) for b in range(bits)) + f") AS key{t}"
        for t in range(tables)
    )
    unpivot = "\n  UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, key{t} AS key FROM keyed" for t in range(tables)
    )
    return f"""
WITH hs AS (
  -- group-salted plane hashes, mirroring _lsh_sign_matrix: group 0 hashes
  -- the bare component index (the historical planes), group g > 0 'g:i'
  SELECT i, g,
         ('0x' || substr(md5(CASE WHEN g = 0 THEN i::VARCHAR
                               ELSE g::VARCHAR || ':' || i::VARCHAR END),
                         1, 15))::BIGINT AS h
  FROM generate_series(0, {dim - 1}) AS t(i),
       generate_series(0, {(n_planes + 59) // 60 - 1}) AS tg(g)
),
{sign_lists},
v AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
keyed AS (
  SELECT vec_id, v, nrm,
         {keys}
  FROM v, {sign_tables}
),
bucketed_all AS (
  {unpivot}
),
-- mirror of the Spark side's hot-bucket cap (LSH_MAX_BUCKET)
bucketed AS (
  SELECT * FROM bucketed_all
  QUALIFY count(*) OVER (PARTITION BY tbl, key) <= {LSH_MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketed a JOIN bucketed b
    ON a.tbl = b.tbl AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       round(list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2]))
             / (x.nrm * y.nrm), 6) AS cos
FROM cand c
JOIN keyed x ON x.vec_id = c.vec_a
JOIN keyed y ON y.vec_id = c.vec_b
WHERE round(list_sum(list_transform(list_zip(x.v, y.v), p -> p[1] * p[2]))
            / (x.nrm * y.nrm), 6) >= {threshold}
"""


#: drop LSH buckets with more members than this before pair generation: a
#: degenerate bucket (all-zero vectors, collapsed embeddings) otherwise
#: produces k^2/2 candidate pairs from one join key. Same policy as
#: neardup_jaccard's max_doc_freq; recall cost only on buckets this hot.
LSH_MAX_BUCKET = 10_000


def cosine_neardup_lsh(
    embeddings: DataFrame,
    threshold: float = 0.35,
    bits: int = 4,
    tables: int = 8,
    max_bucket: int = LSH_MAX_BUCKET,
    center: bool = False,
) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH: ``tables``
    independent sign-bucket keys of ``bits`` bits each; a pair is a candidate
    if it collides in ANY table; candidates (only) are verified exactly.

    Same output schema/semantics as :func:`cosine_neardup` restricted to the
    candidate set — the scale path: the corpus self-join becomes ``tables``
    equi-joins each touching ~1/2^bits of the pairs. Hyperplanes are
    deterministic ±1 Rademacher directions: sign of plane p at component i =
    bit p of md5(i) (portable_hash60 bits). The sign matrix is computed once
    at plan-build time (hashlib, O(dim) work) and embedded as literal arrays
    — per-row cost is a pure multiply-add fold with no hash calls, and any
    engine reproduces the planes from md5, giving a DuckDB-exact oracle
    (cosine_lsh_oracle_sql). Well-mixed (a biased/correlated sign pattern
    collapses recall).

    Recall for a pair at angle θ is 1 − (1 − (1 − θ/π)^bits)^tables: ≈1.0
    for true near-dups (cos ≥ 0.9), ~0.7 at the loose default threshold
    0.35 the synthetic corpus needs — tune (bits, tables) per workload.

    Scale shape: the bucket self-join and the pair dedup carry ONLY
    ``(vec_id, vec_id)`` — never the vectors — so candidate-shuffle bytes are
    O(pairs × 16B), not O(pairs × dim × 8B). Vectors re-enter for the exact
    verify via two joins against the (small) normed-vector table; at corpus
    scale that side stays a per-id shuffle join of the original table, and
    here Catalyst broadcasts it.

    ``center=True`` shifts each hyperplane to pass through the DATA MEAN
    instead of the origin (VERDICT-r9 #4): sign bits become
    sign(<v, s_p> − <mean, s_p>), i.e. the plane offset is a per-plane
    scalar computed from one combinable per-component AVG pass — the
    vectors themselves are untouched, and the exact verify still scores
    ORIGINAL cosines, so only candidate RECALL changes, never a returned
    pair's value. This matters for all-positive feature spaces (audio band
    RMS, image channel stats): an origin hyperplane with an unbalanced ±1
    pattern barely splits positive data (most rows land on its heavy
    side), collapsing effective bits; mean-offset planes split ~50/50 by
    construction. Off by default — the DuckDB-exact face pins the
    origin-plane variant.
    """
    v = embeddings.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        _norm(_as_double(F.col("embedding"))).alias("nrm"),
    )

    # constant-sized plan-build peek (one row, never data-sized): the sign
    # matrix needs the embedding dimensionality
    first = embeddings.select(F.size("embedding").alias("d")).first()
    if first is None:
        return v.limit(0).select(
            F.col("vec_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.lit(0.0).alias("cos"),
        )
    dim = int(first["d"])
    signs = _lsh_sign_matrix(tables * bits, dim)
    offsets = [0.0] * (tables * bits)
    if center:
        # one combinable AVG pass -> d driver scalars (model-sized, never
        # data-sized); plane offsets are <mean, s_p>
        mrow = v.select(
            *[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(dim)]
        ).first()
        means = [float(mrow[f"m{i}"] or 0.0) for i in range(dim)]
        offsets = [
            sum(m * s for m, s in zip(means, signs[p]))
            for p in range(tables * bits)
        ]

    # The per-plane projection fold, built as ONE parsed SQL expression per
    # plane instead of a py4j call per literal: constructing this through
    # Column operators costs 2048 F.lit round-trips plus nested lambda
    # conversions — measured ~7 s of DRIVER time per invocation at 32x64,
    # vs ~0.02 s for the identical expression parsed from text (guide §1:
    # the cost was plan CONSTRUCTION, not execution). The generated tree is
    # operation-for-operation the old one — zip_with multiply, left-fold
    # add from 0.0, CASE on > offset — so results are bit-identical.
    def _dlit(x: float) -> str:
        return repr(float(x)) + "D"

    def proj_bit(plane: int, weight: int):
        arr = ",".join(_dlit(s) for s in signs[plane])
        return F.expr(
            f"CASE WHEN aggregate(zip_with(v, array({arr}), (x, s) -> x * s), "
            f"0.0D, (acc, x) -> acc + x) > {_dlit(offsets[plane])} "
            f"THEN {weight} ELSE 0 END"
        )

    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sum(
                    (proj_bit(t * bits + b, 1 << b) for b in range(bits)),
                    F.lit(0),
                ).alias("key"),
            )
            for t in range(tables)
        ]
    )
    bucketed = v.select("vec_id", F.explode(keys).alias("tk")).select(
        "vec_id", F.col("tk.tbl").alias("tbl"), F.col("tk.key").alias("key")
    )
    # Materialize the bucket table ONCE (guide §3.3: truncate the plan).
    # The 32-plane projection fold is an interpreted Catalyst aggregate-HOF
    # over every component — the most expensive expression in the operator —
    # and `bucketed` feeds THREE consumers (the bucket-size count and both
    # self-join sides), each of which would otherwise re-scan the table and
    # re-run the fold (measured: 44 parquet scans / 72 Exchanges in the
    # static plan; 8.45 s isolated at sf0.1). The checkpointed frame is
    # (vec_id, tbl, key) — 16 B x n x tables, corpus-ID-sized, never
    # vector-sized — so this is exactly the "decide on small rows" shape.
    bucketed = bucketed.localCheckpoint(eager=False)
    # hot-bucket cap: one combinable count, then drop over-full buckets
    # BEFORE the self-join — bounds the per-key pair blowup at k^2/2 with
    # k <= max_bucket (degenerate embeddings collapse buckets otherwise)
    sizes = bucketed.groupBy("tbl", "key").agg(F.count(F.lit(1)).alias("__bn"))
    bucketed = (
        bucketed.join(sizes, ["tbl", "key"])
        .where(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    # same plan-truncation move for the candidate id-pairs: they feed THREE
    # consumers (cand_ids twice via the union, and the verify join) — id-only
    # rows, so the materialization is bytes-per-pair, never vector bytes
    candidates = candidates.localCheckpoint(eager=False)
    # prune the vector table to candidate ids BEFORE the verify joins (the
    # id-only semi-join side stays tiny), and let Catalyst/AQE pick the join
    # strategy: a forced broadcast of the full corpus-sized vector table
    # would OOM exactly in the >1e6-vector regime this operator exists for
    # (same fix as the minhash verify, VERDICT r1 item 8)
    cand_ids = (
        candidates.select(F.col("vec_a").alias("vec_id"))
        .union(candidates.select(F.col("vec_b").alias("vec_id")))
        .distinct()
    )
    vc = v.join(cand_ids, "vec_id", "left_semi")
    # ...and for the candidate-pruned vector slice, which both verify sides
    # read: without this the scan + semi-join runs twice (once per side)
    vc = vc.localCheckpoint(eager=False)
    va = vc.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = vc.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    paired = candidates.join(va, "vec_a").join(vb, "vec_b")

    # exact verify as an Arrow-batched NumPy kernel: the Catalyst
    # zip_with/aggregate fold is interpreted per array element, which at
    # ~1e6 candidates x 64d dominated the whole operator (~6s of a 7s warm
    # run at sf0.1); a vectorized row-wise dot is ~10x faster and uses the
    # same float64 arithmetic as cosine_neardup's block GEMM (both match
    # the list_sum-fold oracle at 6-decimal rounding)
    import numpy as np
    import pandas as pd

    thr = float(threshold)

    def verify_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.stack(pdf["va"].to_numpy())
            B = np.stack(pdf["vb"].to_numpy())
            cos = np.round(
                np.einsum("ij,ij->i", A, B) / (pdf["na"].to_numpy() * pdf["nb"].to_numpy()),
                6,
            )
            keep = cos >= thr
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "cos": cos[keep],
                }
            )

    return paired.mapInPandas(
        verify_batches, schema="vec_a bigint, vec_b bigint, cos double"
    )


def knn_ivf(embeddings: DataFrame, n_queries: int = 5, k: int = 5, bits: int = 2) -> DataFrame:
    """Approximate top-k: random-projection sign buckets (an IVF/LSH hybrid).

    bucket(v) = sign bits of <v, r_b> for ``bits`` deterministic pseudo-random
    directions r_b (elementwise +/-1 pattern derived from (b * index) parity —
    no driver randomness, so the operator is reproducible and oracle-friendly).
    Queries probe only their own bucket: the join is an equi-join on bucket,
    touching ~1/2^bits of the corpus — the 100 TB shape.
    """
    v = _as_double(F.col("embedding"))

    def direction_lambda(b: int):
        # deterministic +/-1 direction: sign = parity of (b+1)*(i+1) mod 3;
        # b is closed over (an extra lambda param would be read as the
        # higher-order function's index argument)
        def f(x, i):
            return x * F.when(((i + 1) * (b + 1)) % 3 < 2, 1.0).otherwise(-1.0)

        return f

    def bucket(col):
        acc = F.lit(0)
        for b in range(bits):
            proj = F.aggregate(
                F.zip_with(col, F.sequence(F.lit(0), F.size(col) - 1), direction_lambda(b)),
                F.lit(0.0),
                lambda a_, x: a_ + x,
            )
            acc = acc + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
        return acc

    base = embeddings.select("vec_id", v.alias("v")).withColumn("bucket", bucket(F.col("v")))
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), "bucket"
    )
    c = base.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv"), "bucket"
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "q_id",
        "c_id",
        (F.round(_dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))), 6) + F.lit(0.0)).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos", "rk")
    )


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """SemDeDup-style semantic deduplication keep-list: drop every vector
    that has a cosine-similar neighbor (cos >= threshold) with a SMALLER
    vec_id; keep the rest. Deterministic one-representative-per-
    neighborhood selection without materializing clusters — the id order
    acts as the priority, so of an exact-duplicate pair the lower id
    always survives.

    Built on :func:`cosine_neardup` (block-GEMM exact pairs — swap in
    ``cosine_neardup_lsh`` candidates for >1e6-vector corpora); the
    keep-list is one distinct + one anti-join. The dropped-id set is
    data-dependent (duplicate-rate-sized), so it is NOT force-broadcast —
    AQE broadcasts it while small and degrades to a shuffle anti-join when
    a high-duplication corpus makes it large.

    Output: (vec_id, label) rows that survive, ordered by vec_id.
    """
    pairs = cosine_neardup(embeddings, threshold=threshold)
    dropped = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    return (
        embeddings.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


SEMANTIC_DEDUP_SQL = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE round(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
              / (a.nrm * b.nrm), 6) >= 0.35
)
SELECT vec_id, label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
ORDER BY vec_id
"""
