"""Deterministic sampling and dataset splitting for training pipelines
(north-star §2.7 adjunct: every 100 TB training run needs a reproducible
train/val split and class-balanced subsamples).

All splits are HASH-based, not RNG-based: membership is a pure function of
the row's key, so it is stable across reruns, partitionings, cluster sizes,
and late-arriving recomputation (rand()-based splits silently reshuffle
membership whenever the plan re-executes — a classic training-data bug).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key_col: str, seed: int):
    return F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(_BUCKETS))


def hash_split(
    df: DataFrame, key_col: str, weights: list[float], seed: int = 0
) -> list[DataFrame]:
    """Split rows into len(weights) disjoint, exhaustive frames by hashing
    the key: same key -> same split, forever. Weights are normalized."""
    total = sum(weights)
    cuts, acc = [], 0.0
    for w in weights:
        acc += w / total
        cuts.append(int(acc * _BUCKETS))
    # float accumulation can land the last cut at _BUCKETS-1 (e.g. weights
    # [7,2,1]), silently dropping rows that hash to the top bucket — pin it
    # so the splits are exhaustive by construction
    cuts[-1] = _BUCKETS
    b = _bucket(key_col, seed)
    out, lo = [], 0
    for hi in cuts:
        out.append(df.filter((b >= lo) & (b < hi)))
        lo = hi
    return out


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, key_col: str, seed: int = 0
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its key hash
    falls under its stratum's fraction. Strata absent from ``fractions``
    are dropped (explicit is better than silent 100%)."""
    frac = F.create_map(
        *[x for kv in fractions.items() for x in (F.lit(kv[0]), F.lit(float(kv[1])))]
    )
    keep_under = frac[F.col(strata_col)]
    return df.filter(
        keep_under.isNotNull() & (_bucket(key_col, seed) < keep_under * _BUCKETS)
    )
