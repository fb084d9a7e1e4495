"""Count-Min sketch frequency estimation — the fixed-memory heavy-hitters
sketch, completing the engine's sketch suite (HLL ``approx_count_distinct``,
Bloom decontamination, KLL/GK quantiles).

Why it matters at 100 TB: exact token counting shuffles one row per DISTINCT
token (vocabulary-sized — fine for words, explosive for n-grams/URLs/IPs).
The CMS reduces every partition to a fixed ``DEPTH x WIDTH`` count table
first (map-side partial aggregation over at most DEPTH*WIDTH distinct keys),
so shuffle volume is a config constant regardless of key cardinality. Point
estimates are ``min`` over the DEPTH probe rows — always an overestimate,
within ``e/WIDTH * total_count`` with high probability.

Construction is plain relational algebra on the portable hash (double
hashing, like the Bloom filter), so the whole operator — sketch AND
estimates — has a DuckDB-exact oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
