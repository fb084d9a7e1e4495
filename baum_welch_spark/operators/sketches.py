"""Fixed-memory sketches built from plain relational algebra: Count-Min
(frequency) and a portable HyperLogLog (cardinality). Together with Bloom
decontamination and KLL/GK quantiles they complete the engine's sketch suite.

Why it matters at 100 TB: exact token counting shuffles one row per DISTINCT
token (vocabulary-sized — fine for words, explosive for n-grams/URLs/IPs).
The CMS reduces every partition to a fixed ``DEPTH x WIDTH`` count table
first (map-side partial aggregation over at most DEPTH*WIDTH distinct keys),
so shuffle volume is a config constant regardless of key cardinality. Point
estimates are ``min`` over the DEPTH probe rows — always an overestimate,
within ``e/WIDTH * total_count`` with high probability.

The HLL here is the PORTABLE twin of ``approx_count_distinct`` (whose HLL++
register bits are engine-private, so that face can only ever be rows-only
checked): bucket and rank come from the portable 60-bit MD5 hash via pure
integer comparisons, registers are a ``groupBy(bucket).max(rho)`` — i.e. a
mergeable, map-side-combining aggregate whose shuffle is at most
``HLL_M`` rows per group per partition regardless of key cardinality — and
the estimator is arranged so every arithmetic step is bit-reproducible in
any engine (see ``_hll_rho``/``hll_distinct``). That buys the one property
the built-in can't have: a DuckDB-exact oracle for an approximate sketch.

Construction is plain relational algebra on the portable hash (double
hashing, like the Bloom filter), so the whole operator — sketch AND
estimates — has a DuckDB-exact oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: sketch geometry: 4 probe rows x 4096 buckets
CMS_DEPTH = 4
CMS_WIDTH = 4096


def _probe_cols(key: str):
    """(row i, bucket) probe pairs via Kirsch-Mitzenmacher double hashing of
    the portable 60-bit hash (two 30-bit halves)."""
    from baum_welch_spark.functions.columns import portable_hash60

    h = portable_hash60(key)
    h1 = h % (1 << 30)
    h2 = F.shiftright(h, 30)
    return [((h1 + i * h2) % CMS_WIDTH).alias(f"b{i}") for i in range(CMS_DEPTH)]


def cms_build(tokens: DataFrame, key: str = "token") -> DataFrame:
    """Sketch a token stream: output (row, bucket, cnt), at most
    DEPTH x WIDTH rows. The groupBy key space is the fixed sketch geometry,
    so partial aggregation caps every partition's shuffle contribution at
    DEPTH x WIDTH rows however many distinct tokens exist."""
    probes = tokens.select(*_probe_cols(key))
    per_row = [
        probes.select(F.lit(i).alias("row"), F.col(f"b{i}").alias("bucket"))
        for i in range(CMS_DEPTH)
    ]
    exploded = per_row[0]
    for p in per_row[1:]:
        exploded = exploded.unionByName(p)
    return exploded.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(cms: DataFrame, keys: DataFrame, key: str = "token") -> DataFrame:
    """Point-estimate counts for ``keys``: min over the DEPTH probe buckets
    (missing bucket rows count 0). The sketch side is fixed-size, so the
    join broadcasts."""
    probes = keys.select(key, *_probe_cols(key))
    est = None
    for i in range(CMS_DEPTH):
        side = cms.where(F.col("row") == i).select(
            F.col("bucket").alias(f"b{i}"), F.col("cnt").alias(f"c{i}")
        )
        probes = probes.join(F.broadcast(side), f"b{i}", "left")
    counts = [F.coalesce(F.col(f"c{i}"), F.lit(0)) for i in range(CMS_DEPTH)]
    est = F.least(*counts)
    return probes.select(key, est.alias("tf_est"))


def vocab_topk_cms(documents: DataFrame, k: int = 100) -> DataFrame:
    """Driver-contract face: CMS estimates for the exact top-``k`` tokens,
    side by side with true counts — (token, tf, tf_est), ordered by
    (tf desc, token). ``tf_est >= tf`` always (CMS never undercounts)."""
    from baum_welch_spark.operators.corpus import vocab_topk

    # same token universe as vocab_topk (no filtering) so tf_est >= tf
    # holds for every returned token
    toks = documents.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    cms = cms_build(toks)
    top = vocab_topk(documents, k=k).select("token", "tf")
    return (
        cms_estimate(cms, top, "token")
        .join(top, "token")
        .select("token", "tf", "tf_est")
        .orderBy(F.desc("tf"), F.asc("token"))
    )


#: HLL geometry: m = 64 buckets (p = 6 index bits off the 60-bit hash).
HLL_M = 64
#: rank cap: with rho <= 32 every register term 2^(32 - rho) is an exact
#: BIGINT, so the harmonic sum is integer arithmetic — order-independent,
#: hence bit-identical across engines (the whole point of this variant).
HLL_RHO_CAP = 32
#: alpha_m * m^2 for m = 64, written as a literal-arithmetic expression that
#: both engines evaluate identically (correctly-rounded IEEE ops on literals)
_HLL_ALPHA_NUM = 0.7213 / (1.0 + 1.079 / 64.0) * 64.0 * 64.0
#: linear-counting lookup m * ln(m / V) for V = 1..m, precomputed HERE so
#: neither engine calls its own libm ln (JVM StrictMath vs duckdb libm can
#: differ in the last ulp) — both read the same 64 literal doubles.
_HLL_LINEAR = [64.0 * math.log(64.0 / v) for v in range(1, HLL_M + 1)]


def _hll_rho(w: Column) -> Column:
    """rho(w) = leading-zero count of the 54-bit suffix + 1, capped at
    HLL_RHO_CAP — as a chain of pure integer threshold comparisons
    (``w >= 2^(54-r)`` -> r), never float log2, so any engine agrees."""
    c = F.when(w >= F.lit(1 << 53), 1)
    for r in range(2, HLL_RHO_CAP):
        c = c.when(w >= F.lit(1 << (54 - r)), r)
    return c.otherwise(HLL_RHO_CAP)


def hll_registers(df: DataFrame, key: str, groups: list[str]) -> DataFrame:
    """Per-group HLL register table: (groups..., bucket, rho). This IS the
    mergeable sketch — union two register tables and re-``max`` to merge,
    which is how 100 TB of partitions combine map-side: each partition
    contributes at most ``HLL_M`` rows per group to the shuffle however
    many distinct keys it holds."""
    from baum_welch_spark.functions.columns import portable_hash60

    h = portable_hash60(key)
    return (
        df.select(
            *groups,
            (h % HLL_M).alias("bucket"),
            _hll_rho(F.shiftright(h, 6)).alias("rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, groups: list[str]) -> DataFrame:
    """Cardinality estimate from a register table, every step engine-
    reproducible: the harmonic sum is the exact BIGINT
    ``sum(2^(32 - rho)) + missing * 2^32`` (absent buckets are rho = 0),
    the raw estimate divides two exactly-representable doubles, and the
    small-range linear-counting branch indexes the precomputed
    ``_HLL_LINEAR`` literal table instead of calling ln."""
    agg = registers.groupBy(*groups).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 32 - rho)"))
            + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 32)
        ).alias("s_int"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("v"),
    )
    # s_int <= m * 2^32 = 2^38 < 2^53, so the division below is exact
    raw = F.lit(_HLL_ALPHA_NUM) / (F.col("s_int") / F.lit(float(1 << 32)))
    linear = F.element_at(
        F.array(*[F.lit(x) for x in _HLL_LINEAR]), F.col("v").cast("int")
    )
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (F.col("v") > 0), linear).otherwise(raw)
    return agg.select(*groups, F.round(est, 4).alias("hll_est"))


def hll_distinct_users(events: DataFrame) -> DataFrame:
    """Driver-contract face: portable-HLL distinct users per event type,
    side by side with the exact count — (event_type, n_exact, hll_est),
    ordered by event_type. ``n_exact`` is the in-face accuracy oracle (the
    thing you could NOT afford at 100 TB — here it doubles as evidence the
    estimate is within the m = 64 error bound); ``hll_est`` is bit-exact
    against the same sketch computed by DuckDB."""
    reg = hll_registers(events, "user_id", ["event_type"])
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        hll_estimate(reg, ["event_type"])
        .join(exact, "event_type")
        .select("event_type", "n_exact", "hll_est")
        .orderBy("event_type")
    )


def _hll_rho_sql(w: str) -> str:
    branches = " ".join(
        f"WHEN {w} >= {1 << (54 - r)} THEN {r}" for r in range(1, HLL_RHO_CAP)
    )
    return f"CASE {branches} ELSE {HLL_RHO_CAP} END"


def _hll_est_case_sql(raw: str = "raw", v: str = "v") -> str:
    """The estimator's branch expression — raw-vs-linear-counting CASE over
    the literal lookup table — as ONE shared SQL fragment, so the two HLL
    oracles in this module (:func:`hll_distinct_users_sql`,
    :func:`hll_overlap_sql`) cannot drift apart."""
    linear = ", ".join(repr(x) for x in _HLL_LINEAR)
    return (
        f"CASE WHEN {raw} <= {2.5 * HLL_M!r} AND {v} > 0 "
        f"THEN ([{linear}])[{v}] ELSE {raw} END"
    )


def _hll_raw_v_sql() -> str:
    """The exact-BIGINT harmonic sum -> raw estimate, plus the empty-bucket
    count ``v`` — the shared per-group SELECT tail of both HLL oracles."""
    return (
        f"{_HLL_ALPHA_NUM!r} /\n"
        f"             ((sum(1::BIGINT << (32 - rho)) + ({HLL_M} - count(*)) * {1 << 32})\n"
        f"              / {float(1 << 32)!r}) AS raw,\n"
        f"           {HLL_M} - count(*) AS v"
    )


def hll_distinct_users_sql() -> str:
    """DuckDB twin of :func:`hll_distinct_users` — same hash, same integer
    thresholds, same exact-BIGINT harmonic sum, same literal lookup; the
    estimator arithmetic is the shared fragments (:func:`_hll_est_case_sql`
    / :func:`_hll_raw_v_sql`) also used by :func:`hll_overlap_sql`."""
    return f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events
),
reg AS (
  SELECT event_type, h % {HLL_M} AS bucket,
         max({_hll_rho_sql(f"(h // {HLL_M})")}) AS rho
  FROM h GROUP BY 1, 2
),
est AS (
  SELECT event_type, round({_hll_est_case_sql()}, 4) AS hll_est
  FROM (
    SELECT event_type, {_hll_raw_v_sql()}
    FROM reg GROUP BY 1
  )
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT e.event_type, ex.n_exact, e.hll_est
FROM est e JOIN ex ON ex.event_type = e.event_type
ORDER BY e.event_type
"""


def _sql_probe(i: int, expr: str) -> str:
    h = f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"
    return f"(({h} % 1073741824) + {i} * ({h} // 1073741824)) % {CMS_WIDTH}"


VOCAB_TOPK_CMS_SQL = f"""
WITH toks_nz AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
cms AS (
  {" UNION ALL ".join(
      f"SELECT {i} AS row, {_sql_probe(i, 'token')} AS bucket, count(*) AS cnt "
      f"FROM toks_nz GROUP BY {_sql_probe(i, 'token')}"
      for i in range(CMS_DEPTH)
  )}
),
top AS (
  SELECT token, count(*) AS tf FROM toks_nz GROUP BY token
  ORDER BY tf DESC, token ASC LIMIT 100
),
est AS (
  SELECT t.token, t.tf,
         least({", ".join(
             f"coalesce((SELECT cnt FROM cms c WHERE c.row = {i} "
             f"AND c.bucket = {_sql_probe(i, 't.token')}), 0)"
             for i in range(CMS_DEPTH)
         )}) AS tf_est
  FROM top t
)
SELECT token, tf, tf_est FROM est ORDER BY tf DESC, token ASC
"""



def hll_overlap(df: DataFrame, key: str, type_col: str) -> DataFrame:
    """Sketch SET ALGEBRA on the portable HLL: audience overlap between
    every pair of ``type_col`` values by inclusion-exclusion —
    ``|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)`` where ``est(A ∪ B)`` is the
    estimate of the MERGED register table (per-bucket max — the union of
    two HLL sketches is exact at sketch level, the property that makes HLL
    composable where raw distinct counts are not).

    This is the 100 TB design point: the corpus is scanned ONCE into
    per-type registers (at most ``HLL_M`` rows per type reach the shuffle
    from each partition); every pairwise union/overlap after that is
    arithmetic on a types x 64 row table — a 50-type cross-matrix costs no
    additional corpus scan, while the exact twin (carried in-face as the
    accuracy oracle) needs a per-pair distinct self-join that grows with
    key cardinality.

    Exactness: ``est`` values reuse the committed bit-exact estimator
    (:func:`hll_estimate`); the inclusion-exclusion result is a fixed-order
    3-term expression over those identical doubles, emitted UNROUNDED (the
    ewma lesson: identical inputs + identical op order needs no rounding
    convention, and rounding is itself a cross-engine hazard).

    Output: ``(type_a, type_b, n_exact_overlap, est_a, est_b, est_union,
    overlap_est)`` for type_a < type_b, ordered by (type_a, type_b).
    """
    base = df.select(F.col(key).alias("k"), F.col(type_col).alias("t"))
    # eager-checkpoint the register table (types x 64 rows): THREE lazy
    # consumers read it (est, the pair-tagged union registers, and the
    # distinct type list), and a merely-persisted frame would re-run the
    # corpus scan per consumer when the caller finally collects (persist
    # only helps if an action lands while it is still registered, which a
    # lazily-returned frame cannot guarantee)
    reg = hll_registers(base, "k", ["t"]).localCheckpoint(eager=True)
    est = hll_estimate(reg, ["t"])
    # every unordered type pair, each carrying both members' registers:
    # pairs and registers are both types x 64 rows, so these are broadcast
    # joins over KB-scale frames regardless of corpus size
    types = reg.select("t").distinct()
    pairs = types.select(F.col("t").alias("type_a")).join(
        types.select(F.col("t").alias("type_b")),
        F.col("type_a") < F.col("type_b"),
    )
    members = pairs.select(
        "type_a", "type_b", F.col("type_a").alias("member")
    ).unionByName(pairs.select("type_a", "type_b", F.col("type_b").alias("member")))
    union_reg = (
        reg.join(F.broadcast(members), reg.t == members.member)
        .groupBy("type_a", "type_b", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    union_est = hll_estimate(union_reg, ["type_a", "type_b"]).withColumnRenamed(
        "hll_est", "est_union"
    )
    # exact overlap twin: the per-pair distinct self-join this sketch
    # replaces at scale
    ut = base.distinct()
    a = ut.select(F.col("t").alias("type_a"), "k")
    b = ut.select(F.col("t").alias("type_b"), F.col("k").alias("kb"))
    exact = (
        a.join(b, (a.k == b.kb) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_exact_overlap"))
    )
    return (
        union_est.join(
            est.select(F.col("t").alias("type_a"), F.col("hll_est").alias("est_a")),
            "type_a",
        )
        .join(
            est.select(F.col("t").alias("type_b"), F.col("hll_est").alias("est_b")),
            "type_b",
        )
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("n_exact_overlap", F.lit(0)).alias("n_exact_overlap"),
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("overlap_est"),
        )
        .orderBy("type_a", "type_b")
    )


def hll_overlap_custs(orders: DataFrame) -> DataFrame:
    """Driver-contract face: customer-audience overlap across order
    priorities (~1100 shared of ~1300 per class at sf0.01 — PARTIAL
    overlap, so the inclusion-exclusion estimate has real signal to
    track, unlike the saturated every-user-does-everything events table)."""
    return hll_overlap(orders, "o_custkey", "o_orderpriority")


def hll_overlap_sql(table: str, key: str, type_col: str) -> str:
    """DuckDB twin of :func:`hll_overlap` — same hash, thresholds,
    exact-BIGINT harmonic sums, literal linear-counting lookup, and the
    same fixed-order inclusion-exclusion over the identical doubles; the
    estimator arithmetic is the shared :func:`_hll_est_case_sql` /
    :func:`_hll_raw_v_sql` fragments also used by
    :func:`hll_distinct_users_sql`."""
    est_case = _hll_est_case_sql()
    return f"""
WITH h AS (
  SELECT {type_col} AS t,
         ('0x' || substr(md5({key}::VARCHAR), 1, 15))::BIGINT AS h
  FROM {table}
),
reg AS (
  SELECT t, h % {HLL_M} AS bucket,
         max({_hll_rho_sql(f"(h // {HLL_M})")}) AS rho
  FROM h GROUP BY 1, 2
),
est AS (
  SELECT t, round({est_case}, 4) AS hll_est
  FROM (
    SELECT t, {_hll_raw_v_sql()}
    FROM reg GROUP BY 1
  )
),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b
  FROM (SELECT DISTINCT t FROM reg) a
  JOIN (SELECT DISTINCT t FROM reg) b ON a.t < b.t
),
union_reg AS (
  SELECT p.type_a, p.type_b, r.bucket, max(r.rho) AS rho
  FROM pairs p
  JOIN reg r ON r.t = p.type_a OR r.t = p.type_b
  GROUP BY 1, 2, 3
),
union_est AS (
  SELECT type_a, type_b, round({est_case}, 4) AS est_union
  FROM (
    SELECT type_a, type_b, {_hll_raw_v_sql()}
    FROM union_reg GROUP BY 1, 2
  )
),
ut AS (SELECT DISTINCT {key} AS k, {type_col} AS t FROM {table}),
exact AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_exact_overlap
  FROM ut a JOIN ut b ON a.k = b.k AND a.t < b.t
  GROUP BY 1, 2
)
SELECT u.type_a, u.type_b,
       COALESCE(x.n_exact_overlap, 0) AS n_exact_overlap,
       ea.hll_est AS est_a, eb.hll_est AS est_b, u.est_union,
       ea.hll_est + eb.hll_est - u.est_union AS overlap_est
FROM union_est u
JOIN est ea ON ea.t = u.type_a
JOIN est eb ON eb.t = u.type_b
LEFT JOIN exact x ON x.type_a = u.type_a AND x.type_b = u.type_b
ORDER BY u.type_a, u.type_b
"""


HLL_OVERLAP_CUSTS_SQL = hll_overlap_sql("orders", "o_custkey", "o_orderpriority")
