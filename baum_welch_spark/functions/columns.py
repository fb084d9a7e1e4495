"""Reusable column-expression library (the engine's scalar-function surface).

The reference has no scalar function library (SURVEY §2.5 — int/double
arithmetic plus charAt key surgery only); this module is the engine's
equivalent of a functions catalog: vector math, tokenization, shingling —
all pure Catalyst expressions that stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash60(col: Column | str) -> Column:
    """Engine-agnostic deterministic 60-bit hash: the first 15 hex digits of
    the standard MD5 digest, as a non-negative BIGINT.

    Unlike Spark's xxhash64 (engine-specific bits), the identical value is
    computable in any engine — DuckDB spells it
    ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — so hash-derived artifacts
    (splits, LSH buckets, signatures) are reproducible outside Spark and
    their operators get DuckDB-exact oracles. Still whole-stage codegen
    JVM-side; ~2x the cost of xxhash64, which only matters when hashing is
    the bottleneck (use xxhash64 where cross-engine parity isn't needed).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def as_double_array(col: Column | str) -> Column:
    """array<float> -> array<double> (vector math in double precision)."""
    return F.transform(col, lambda x: x.cast("double"))


def round0(col: Column, scale: int) -> Column:
    """``F.round`` with IEEE signed zero normalized to +0.0.

    The driver's oracle hash is byte-exact on rounded values, and DuckDB's
    round() can emit -0.0 where Spark emits 0.0 (or vice versa) for values
    that round to zero from below — one such cell flipped the
    emb_covariance gate in round 5. ``-0.0 + 0.0 == +0.0`` in IEEE 754, so
    appending ``+ 0.0`` canonicalizes the sign without changing any other
    value. Every SIGNED rounded oracle face (covariances, cosine scores,
    regression coefficients, log-space scores) must use this — and spell
    ``round(..., s) + 0.0`` in the DuckDB SQL. Strictly-positive aggregates
    (revenues, counts, probabilities) don't need it.
    """
    return F.round(col, scale) + F.lit(0.0)


def pair_structs(ds: Column | str, a_name: str = "doc_a", b_name: str = "doc_b") -> Column:
    """All unordered pairs (a before b in array order) from a SORTED id
    array, as an array of (a_name, b_name) structs — the codegen pair
    explode the bucket-join dedup operators share (one shuffle of the
    grouped lists instead of a self-join's two, blowup inside codegen,
    identical output to the ``x.key == y.key AND x.id < y.id`` self-join).
    The caller bounds the array size (df/bucket caps): one row holds
    len^2/2 structs.
    """
    c = F.col(ds) if isinstance(ds, str) else ds
    return F.flatten(
        F.transform(
            c,
            lambda x, i: F.transform(
                F.slice(c, i + F.lit(2), F.size(c)),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def words(col: Column | str = "text", lower: bool = True) -> Column:
    """Whitespace tokenization (optionally lowercased)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c) if lower else c, " ")


def word_shingles(text_col: Column | str, k: int = 3) -> Column:
    """Distinct word k-gram shingles as an array column (docs shorter than k
    words yield an empty array).

    PERF: pass a column that is ALREADY a materialized words array (or a
    projected split) where possible — handing this an inline ``text`` column
    makes Catalyst re-evaluate the split for every ``element_at`` inside the
    lambda, k evaluations per position per row (measured ~7x slower; see
    ``operators.dedup._shingles`` for the two-projection fix pattern)."""
    ws = words(text_col, lower=False)
    idx = F.sequence(F.lit(0), F.greatest(F.size(ws) - k, F.lit(-1)))
    grams = F.transform(idx, lambda g: F.concat_ws(" ", *[F.element_at(ws, g + i + 1) for i in range(k)]))
    return F.when(F.size(ws) >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))
