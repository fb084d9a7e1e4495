"""Multimodal column plumbing (north-star §2.7): treat image/audio/video as
opaque ``binary`` payloads with a typed metadata struct, processed by
Arrow-batched mapInPandas operators.

The image/audio decode libraries are not in this container, so the decode
kernel is STUBBED: ``decode_stub=True`` (default) derives deterministic fake
features from the payload bytes; ``decode_stub=False`` raises
NotImplementedError at the point a real codec would run. Everything
Spark-side — schema, partitioning, UDF signature, Arrow batch shape — is
real and tested.

Scale: assets are opaque bytes; feature extraction is a narrow map (no
shuffle), and batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so executor memory holds only
one Arrow batch of payloads at a time.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = "asset_id bigint, modality string, n_bytes int, sha256 string, feature array<float>"


def synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (the container has no real media)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8).tobytes()
        meta = {
            "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
            "width": 64 if modality != "audio" else None,
            "height": 64 if modality != "audio" else None,
            "duration_ms": None if modality == "image" else 1000 + i,
        }
        rows.append((i, modality, payload, meta))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: features are
    bytes of the sha256 digest scaled to [0, 1)."""
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[:dim], dtype=np.uint8).astype(np.float32) / 256.0


def extract_features(assets: DataFrame, decode_stub: bool = True, dim: int = 8) -> DataFrame:
    """Decode / feature-extract over binary payloads via mapInPandas.

    With decode_stub=False this is where a real codec (PIL/librosa/ffmpeg)
    would decode ``payload`` per ``meta.mime``; the container lacks those
    libs, so it raises NotImplementedError (clearly marked stub).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg (not in container); "
                    "run with decode_stub=True for the deterministic fake kernel"
                )
            feats = [_fake_decode(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha256": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": feats,
                }
            )

    return assets.mapInPandas(extract, schema=FEATURES_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling *plan*: expands each video asset into the frame
    timestamps a decoder would extract (pure Catalyst — sequence + explode).
    The actual pixel decode is the stubbed kernel above."""
    return (
        assets.filter(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def dedup_assets_exact(assets: DataFrame) -> DataFrame:
    """Exact binary dedup by payload digest — same shape as document dedup
    (sha2 works directly on binary columns, JVM-side)."""
    return (
        assets.select("asset_id", F.sha2("payload", 256).alias("digest"))
        .groupBy("digest")
        .agg(F.min("asset_id").alias("keep_asset_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_asset_id", "n_copies")
    )


def neardup_assets_by_feature(
    assets: DataFrame, threshold: float = 0.98, decode_stub: bool = True
) -> DataFrame:
    """Near-duplicate assets by feature-vector cosine — the multimodal twin
    of document near-dup: decode (stub) -> feature vector -> exact cosine
    pairs over the (small) feature table.

    Composition: extract_features (narrow mapInPandas) feeds the same
    pair-verify shape as similarity.cosine_neardup. At corpus scale the
    pair stage swaps to the LSH candidate path — features are just another
    embedding column once extracted.
    """
    from baum_welch_spark.functions.columns import as_double_array, dot, l2_norm

    feats = extract_features(assets, decode_stub=decode_stub).select(
        "asset_id", as_double_array(F.col("feature")).alias("v")
    )
    a = feats.select(
        F.col("asset_id").alias("asset_a"), F.col("v").alias("va"), l2_norm(F.col("v")).alias("na")
    )
    b = feats.select(
        F.col("asset_id").alias("asset_b"), F.col("v").alias("vb"), l2_norm(F.col("v")).alias("nb")
    )
    return (
        a.join(b, F.col("asset_a") < F.col("asset_b"))
        .withColumn("cos", F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("asset_a", "asset_b", "cos")
    )
