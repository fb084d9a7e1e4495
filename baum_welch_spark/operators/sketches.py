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


def hll_distinct_users_sql() -> str:
    """DuckDB twin of :func:`hll_distinct_users` — same hash, same integer
    thresholds, same exact-BIGINT harmonic sum, same literal lookup."""
    linear = ", ".join(repr(x) for x in _HLL_LINEAR)
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
agg AS (
  SELECT event_type,
         sum(1::BIGINT << (32 - rho)) + ({HLL_M} - count(*)) * {1 << 32} AS s_int,
         {HLL_M} - count(*) AS v
  FROM reg GROUP BY 1
),
est AS (
  SELECT event_type, v,
         {_HLL_ALPHA_NUM!r} / (s_int / {float(1 << 32)!r}) AS raw
  FROM agg
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT e.event_type, ex.n_exact,
       round(CASE WHEN e.raw <= {2.5 * HLL_M!r} AND e.v > 0
                  THEN ([{linear}])[e.v]
                  ELSE e.raw END, 4) AS hll_est
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
