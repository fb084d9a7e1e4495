"""Training-sequence assembly operators: pack documents into fixed-capacity
training sequences and split documents into overlapping token chunks.

These are the last mile of an LLM data pipeline — after dedup/quality/
mixing, the surviving corpus must be laid out as fixed-length sequences for
the trainer. The reference has no such surface (north-star §2.7 extension).

Scale posture (100 TB corpus):

- ``pack_sequences`` — the classic concat-then-chunk layout needs a GLOBAL
  running token offset, which as one window is a single-partition bottleneck.
  Instead packing is per ``shard`` (the ``source`` column — training shards
  are the natural unit): the cumulative-sum window partitions by shard, so
  parallelism equals the shard count and no task ever sees more than one
  shard's metadata. Chunk ids are (shard, chunk_id) pairs. Only token COUNTS
  move through the shuffle — never token text.
- ``chunk_documents`` — an embarrassingly-parallel projection + explode; no
  shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _words(col: str = "text"):
    from baum_welch_spark.functions.columns import words

    return words(col)


def pack_sequences(
    documents: DataFrame, capacity: int = 512, shard_col: str = "source"
) -> DataFrame:
    """Concat-then-chunk packing plan: within each shard, documents are laid
    end-to-end in ``doc_id`` order and cut into training sequences of exactly
    ``capacity`` tokens (documents may span chunk boundaries — the standard
    GPT-style pretraining layout, no padding waste).

    Returns the packing PLAN, one row per (document x chunk) slice:
    (shard, chunk_id, doc_id, tok_start, n_toks, chunk_off) — "tokens
    [tok_start, tok_start+n_toks) of doc_id land in chunk chunk_id at offset
    chunk_off". Emitting the plan rather than materialized token arrays
    keeps the shuffle metadata-sized; the trainer's loader applies it
    shard-locally.
    """
    ws = F.col("ws")
    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sized = (
        documents.select(
            F.col(shard_col).alias("shard"), "doc_id", F.size(_words()).alias("n_tokens")
        )
        .withColumn("t_end", F.sum("n_tokens").over(w))
        .withColumn("t_start", F.col("t_end") - F.col("n_tokens"))
    )
    chunk = F.col("chunk_id")
    return (
        sized.where(F.col("n_tokens") > 0)
        .select(
            "shard",
            "doc_id",
            "n_tokens",
            "t_start",
            F.explode(
                F.sequence(
                    F.floor(F.col("t_start") / capacity),
                    F.floor((F.col("t_end") - 1) / capacity),
                )
            ).alias("chunk_id"),
        )
        .select(
            "shard",
            chunk.cast("bigint").alias("chunk_id"),
            "doc_id",
            F.greatest(chunk * capacity - F.col("t_start"), F.lit(0))
            .cast("bigint")
            .alias("tok_start"),
            (
                F.least((chunk + 1) * capacity - F.col("t_start"), F.col("n_tokens"))
                - F.greatest(chunk * capacity - F.col("t_start"), F.lit(0))
            )
            .cast("bigint")
            .alias("n_toks"),
            F.greatest(F.col("t_start") - chunk * capacity, F.lit(0))
            .cast("bigint")
            .alias("chunk_off"),
        )
    )


def pack_sequences_sql(capacity: int = 512) -> str:
    return f"""
WITH sized AS (
  SELECT source AS shard, doc_id,
         len(string_split(lower(text), ' ')) AS n_tokens,
         sum(len(string_split(lower(text), ' ')))
           OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS t_end
  FROM documents
),
spans AS (
  SELECT shard, doc_id, n_tokens, t_end - n_tokens AS t_start, t_end
  FROM sized WHERE n_tokens > 0
)
SELECT shard,
       CAST(c AS BIGINT) AS chunk_id,
       doc_id,
       CAST(greatest(c * {capacity} - t_start, 0) AS BIGINT) AS tok_start,
       CAST(least((c + 1) * {capacity} - t_start, n_tokens)
            - greatest(c * {capacity} - t_start, 0) AS BIGINT) AS n_toks,
       CAST(greatest(t_start - c * {capacity}, 0) AS BIGINT) AS chunk_off
FROM spans,
     unnest(generate_series(CAST(t_start // {capacity} AS BIGINT),
                            CAST((t_end - 1) // {capacity} AS BIGINT))) AS u(c)
"""


PACK_SEQUENCES_SQL = pack_sequences_sql()


def chunk_documents(
    documents: DataFrame, size: int = 64, overlap: int = 16
) -> DataFrame:
    """Sliding-window token chunking with overlap (RAG/embedding-index
    prep): windows of ``size`` tokens starting every ``size - overlap``
    tokens, last window truncated at the document end.

    Output: (doc_id, chunk_idx, tok_start, n_toks, chunk_text). Pure
    projection + explode — runs at scan speed, no shuffle.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    step = size - overlap
    ws = F.col("ws")
    n = F.size(ws)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    return (
        documents.select("doc_id", _words().alias("ws"))
        .where(n > 0)
        .select("doc_id", "ws", F.posexplode(starts).alias("chunk_idx", "tok_start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.col("tok_start").cast("bigint").alias("tok_start"),
            F.least(F.lit(size), F.size(ws) - F.col("tok_start")).cast("bigint").alias("n_toks"),
            F.array_join(F.slice(ws, F.col("tok_start") + 1, size), " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(size: int = 64, overlap: int = 16) -> str:
    step = size - overlap
    return f"""
WITH base AS (
  SELECT doc_id, string_split(lower(text), ' ') AS ws,
         len(string_split(lower(text), ' ')) AS n
  FROM documents
)
SELECT doc_id,
       CAST(u.s // {step} AS BIGINT) AS chunk_idx,
       CAST(u.s AS BIGINT) AS tok_start,
       CAST(least({size}, n - u.s) AS BIGINT) AS n_toks,
       array_to_string(list_slice(ws, u.s + 1, least(u.s + {size}, n)), ' ') AS chunk_text
FROM base,
     unnest(generate_series(0, greatest(n - 1, 0), {step})) AS u(s)
WHERE n > 0
"""


CHUNK_DOCUMENTS_SQL = chunk_documents_sql()
