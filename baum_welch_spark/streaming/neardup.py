"""Streaming near-duplicate detection against a static reference corpus —
the incremental-ingestion face of ``operators.dedup.minhash_lsh_pairs``
(absent in the reference; north-star §2.7 pipeline component).

The production shape: a 100 TB reference corpus is indexed ONCE (band-key
index + shingle sets, both static DataFrames); newly ingested documents
stream through, compute their MinHash signature per row (stateless — no
streaming aggregation state at all), probe the index with a stream-static
equi-join, and are exact-Jaccard-verified against only the colliding
reference docs. State is bounded by the pair-dedup watermark horizon, never
by stream length or corpus size.

Signature math mirrors the batch operator EXACTLY (same portable MD5 base
hash, same ``(h * (2k+1) + k^2+7) mod P`` permutations, same band keys), so
a document streams to the same buckets the batch index was built with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from baum_welch_spark.operators.dedup import (
    MERSENNE_P,
    _minhash_signatures_from,
    _shingles,
    band_key_structs,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents table with a processing-time ingest
    timestamp (the table has no event time; the ingest ts only bounds the
    pair-dedup state horizon)."""
    raw = (
        spark.readStream.format("parquet")
        .schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ingest_ts", F.current_timestamp())


def build_reference_index(
    reference: DataFrame, num_hashes: int = 32, bands: int = 8, k: int = 3
) -> tuple[DataFrame, DataFrame]:
    """One-time batch indexing of the reference corpus: ``(band_index,
    shingle_sets)``. ``band_index`` is (band, bkey, ref_id); ``shingle_sets``
    is (ref_id, ref_shingles, ref_n). Persist both in production — they are
    the only corpus-sized artifacts and they never change per batch.

    ``num_hashes``/``bands``/``k`` MUST match the values later passed to
    :func:`neardup_stream` — a mismatched shingle size or banding probes
    buckets that were never built and silently returns no pairs.
    """
    from baum_welch_spark.operators.dedup import banded_signatures

    # the ONE banding definition (dedup.banded_signatures) — a private
    # spelling here could drift and make streamed docs silently stop
    # colliding with batch-built buckets
    band_index = banded_signatures(reference, num_hashes, bands, k=k).select(
        F.col("doc_id").alias("ref_id"), "band", "bkey"
    )
    sets = (
        _shingles(reference, k=k)
        .groupBy("doc_id")
        .agg(F.collect_set("s").alias("ref_shingles"))
        .select(
            F.col("doc_id").alias("ref_id"),
            "ref_shingles",
            F.size("ref_shingles").alias("ref_n"),
        )
    )
    return band_index, sets


def _row_signature_columns(num_hashes: int):
    """Per-row (stateless) MinHash signature columns from a materialized
    base-hash array column ``hs`` — identical values to the batch
    groupBy-min signature: the min over shingle instances of each permuted
    portable hash. The base hash is projected ONCE as ``hs`` by the caller
    (md5 per shingle is the expensive part; inlining it here would repeat it
    num_hashes times per row — same hoist the batch path does)."""
    return [
        F.array_min(
            F.transform(
                F.col("hs"),
                lambda h: (h * F.lit(2 * k + 1) + F.lit(k * k + 7)) % F.lit(MERSENNE_P),
            )
        ).alias(f"mh{k}")
        for k in range(num_hashes)
    ]


def neardup_stream(
    docs: DataFrame,
    band_index: DataFrame,
    shingle_sets: DataFrame,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    dedup_watermark: str = "10 minutes",
) -> DataFrame:
    """(doc_id, ref_id, jaccard) for each streamed doc vs colliding reference
    docs with exact Jaccard >= threshold. ``num_hashes``/``bands``/``k``
    must match the values :func:`build_reference_index` was called with.

    Plan: per-row signature -> explode ≤``bands`` band rows -> stream-static
    equi-join on (band, bkey) -> watermark-bounded pair dedup BEFORE the
    verify (a true near-dup collides in most bands; deduping first avoids
    ~``bands``x redundant shingle-set joins and intersections per pair, the
    same candidates-first ``.distinct()`` the batch operator does) ->
    stream-static join to the reference shingle sets -> exact verify.
    """
    from baum_welch_spark.functions.columns import portable_hash60
    from baum_welch_spark.operators.dedup import shingle_array

    # two-step materialization: the shingle array (shared batch/stream
    # definition), then its base hashes — each computed once per row, not
    # once per downstream lambda reference
    with_sh = (
        docs.select("doc_id", "ingest_ts", F.split(F.col("text"), " ").alias("ws"))
        .filter(F.size(F.col("ws")) >= k)
        .select("doc_id", "ingest_ts", shingle_array(k).alias("sh"))
        .select(
            "doc_id",
            "ingest_ts",
            "sh",
            F.transform(
                F.col("sh"), lambda s: F.pmod(portable_hash60(s), F.lit(MERSENNE_P))
            ).alias("hs"),
        )
    )
    bandkeys = band_key_structs(num_hashes, bands)
    banded = (
        with_sh.select("doc_id", "ingest_ts", "sh", *_row_signature_columns(num_hashes))
        .select("doc_id", "ingest_ts", "sh", F.explode(bandkeys).alias("bk"))
        .select(
            "doc_id",
            "ingest_ts",
            "sh",
            F.col("bk.band").alias("band"),
            F.col("bk.bkey").alias("bkey"),
        )
    )
    candidates = (
        banded.join(band_index, ["band", "bkey"])
        .filter(F.col("doc_id") != F.col("ref_id"))
        .select("doc_id", "ref_id", "sh", "ingest_ts")
        .withWatermark("ingest_ts", dedup_watermark)
        .dropDuplicatesWithinWatermark(["doc_id", "ref_id"])
    )
    inter = F.size(F.array_intersect(F.col("sh"), F.col("ref_shingles")))
    return (
        candidates.join(shingle_sets, "ref_id")
        .withColumn("c", inter)
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.size("sh") + F.col("ref_n") - F.col("c")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "ref_id", "jaccard")
    )


def decontaminate_stream(
    docs: DataFrame, eval_grams: DataFrame, n: int = 5
) -> DataFrame:
    """Streaming benchmark decontamination: each ingested document is checked
    against the static eval n-gram set on arrival — the incremental twin of
    ``operators.corpus.decontaminate`` for continuously-ingested corpora.

    ``eval_grams`` is a static one-column (``g``) DataFrame of the benchmark
    suite's distinct word n-grams — an INPUT CONTRACT: it must be
    benchmark-sized (not corpus-derived like batch decontaminate's, which
    goes unhinted for AQE). The hint is deliberate here because streaming
    plans have no AQE to size the build side at runtime; a caller feeding
    an unbounded frame would stall every micro-batch, so don't.
    Output: (doc_id, n_overlap) per contaminated doc —
    stateless except the final per-doc count, which is per-micro-batch
    (each doc's text arrives whole in one row, so no cross-batch state is
    needed and no watermark is required).
    """
    from baum_welch_spark.functions.columns import words
    from baum_welch_spark.operators.dedup import shingle_array

    # LOWERCASED words — the batch decontaminate convention (corpus._words),
    # unlike the raw-cased dedup shingles
    with_grams = (
        docs.select("doc_id", words("text").alias("ws"))
        .filter(F.size(F.col("ws")) >= n)
        .select("doc_id", F.explode(shingle_array(n)).alias("g"))
    )
    return (
        with_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
