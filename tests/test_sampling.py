"""Sampling/split tests: determinism, disjoint+exhaustive partition,
fraction accuracy, and the AQE skew-join split proof."""

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.sampling import hash_split, stratified_sample
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def test_hash_split_disjoint_exhaustive_deterministic(spark, events):
    train, val, test = hash_split(events, "event_id", [0.8, 0.1, 0.1], seed=1)
    n = events.count()
    ids = [set(r.event_id for r in d.select("event_id").collect()) for d in (train, val, test)]
    assert len(ids[0] | ids[1] | ids[2]) == n
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # 80/10/10 within sampling noise
    assert abs(len(ids[0]) / n - 0.8) < 0.05
    # determinism across recomputation and repartitioning
    again = hash_split(events.repartition(7), "event_id", [0.8, 0.1, 0.1], seed=1)
    assert {r.event_id for r in again[1].select("event_id").collect()} == ids[1]
    # a different seed moves the boundary
    other = hash_split(events, "event_id", [0.8, 0.1, 0.1], seed=2)
    assert {r.event_id for r in other[1].select("event_id").collect()} != ids[1]


def test_hash_split_exhaustive_with_uneven_weights(spark):
    """weights like [7,2,1] used to leave the last cut at 999_999 / 1_000_000
    via float accumulation, silently dropping rows hashing to the very top
    bucket (ADVICE r1). Plant keys that land in bucket 999_999 and assert
    they survive the split."""
    from baum_welch_spark.operators.sampling import _BUCKETS, _bucket

    universe = spark.range(0, 3_000_000).select(F.col("id").alias("key"))
    top = universe.filter(_bucket("key", seed=1) == _BUCKETS - 1).limit(5)
    df = top.unionByName(universe.limit(100)).distinct().cache()
    n = df.count()
    assert n > 100  # at least one planted top-bucket key
    for weights in ([7, 2, 1], [1 / 3, 1 / 3, 1 / 3], [0.8, 0.1, 0.1]):
        splits = hash_split(df, "key", weights, seed=1)
        assert sum(d.count() for d in splits) == n, weights
    df.unpersist()


def test_stratified_sample_fractions_and_drop(spark, events):
    got = stratified_sample(
        events, "event_type", {"view": 0.5, "purchase": 1.0}, key_col="event_id", seed=3
    )
    counts = {r.event_type: r.n for r in got.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    base = {r.event_type: r.n for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"view", "purchase"}  # unlisted strata dropped
    assert counts["purchase"] == base["purchase"]
    assert abs(counts["view"] / base["view"] - 0.5) < 0.1
    # sample is a subset of the source and stable
    assert got.count() == stratified_sample(
        events, "event_type", {"view": 0.5, "purchase": 1.0}, key_col="event_id", seed=3
    ).count()


def test_aqe_splits_skewed_join(spark):
    """Prove the session's AQE skew-join posture: an extreme hot key gets
    split at runtime (OptimizeSkewedJoin marks the SMJ with isSkew=true)."""
    left = spark.range(0, 400_000).select(
        F.when(F.col("id") < 390_000, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 2_000).select(F.col("id").alias("k"), F.lit(1).alias("r"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        # collect() on the joined frame itself finalizes THIS df's QE under
        # AQE (a write/noop spawns a separate QueryExecution — audit.py)
        j = left.join(right, "k")
        j.collect()
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")


def test_cap_per_group_bounds_and_determinism(spark):
    from baum_welch_spark.operators.sampling import cap_per_group
    from baum_welch_spark.sources.io import load_table

    docs = load_table(spark, SF0001, "documents")
    capped = cap_per_group(docs, "source", "doc_id", k=5)
    per_group = {r.source: r.n for r in capped.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert all(n <= 5 for n in per_group.values())
    # groups with >= 5 rows are capped exactly at 5
    full = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for g, n in full.items():
        assert per_group.get(g, 0) == min(n, 5)
    # deterministic: identical kept set on re-run
    ids1 = {r.doc_id for r in capped.select("doc_id").collect()}
    ids2 = {r.doc_id for r in cap_per_group(docs, "source", "doc_id", k=5).select("doc_id").collect()}
    assert ids1 == ids2


def test_temperature_mixture_flattens_toward_sqrt(spark):
    """alpha = 0.5 keeps per-group counts proportional to sqrt(n): the
    smallest group keeps (nearly) everything and the largest is downsampled
    the hardest; allocation is exact floor(sqrt(n) * min(n / sqrt(n)))."""
    import math

    from baum_welch_spark.operators.sampling import temperature_mixture

    rows = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "k long, g string")
    kept = temperature_mixture(df, "g", "k").groupBy("g").count().collect()
    got = {r.g: r["count"] for r in kept}
    scale = min(n / math.sqrt(n) for n in (400, 100, 25))  # = sqrt(25) = 5
    want = {g: math.floor(math.sqrt(n) * scale) for g, n in [("big", 400), ("mid", 100), ("small", 25)]}
    assert got == want  # {big: 100, mid: 50, small: 25}
    # the kept ratio rises as group size falls (the flattening property)
    assert got["small"] / 25 > got["mid"] / 100 > got["big"] / 400
    # deterministic on rerun
    a = {r.k for r in temperature_mixture(df, "g", "k").select("k").collect()}
    b = {r.k for r in temperature_mixture(df, "g", "k").select("k").collect()}
    assert a == b


def test_portable_hash60_matches_duckdb_on_arbitrary_strings(spark):
    """The whole portable-oracle foundation: Spark's portable_hash60 must
    equal DuckDB's ('0x' || substr(md5(x),1,15))::BIGINT for arbitrary
    strings (property-based sample plus adversarial edge cases)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from baum_welch_spark.functions.columns import portable_hash60

    cases = ["", " ", "a", "0", ":", "_", "näïve", "日本語", "a b c", "x" * 500]

    @settings(max_examples=30, deadline=None)
    @given(st.text(min_size=0, max_size=80))
    def collect(s):
        cases.append(s)

    collect()
    # single Spark job for all cases; DuckDB one query per value
    df = spark.createDataFrame([(i, s) for i, s in enumerate(cases)], "i int, s string")
    got = {r.i: r.h for r in df.select("i", portable_hash60("s").alias("h")).collect()}
    con = duckdb.connect()
    for i, s in enumerate(cases):
        expect = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[i] == expect, f"hash mismatch for {s!r}"


def test_weighted_sample_deterministic_and_proportional(spark):
    from baum_welch_spark.operators.sampling import weighted_sample
    from baum_welch_spark.sources.io import load_table

    events = load_table(spark, SF0001, "events")
    kept = weighted_sample(events, "event_id", F.col("value") / 100)
    ids1 = {r.event_id for r in kept.select("event_id").collect()}
    ids2 = {r.event_id for r in weighted_sample(events, "event_id", F.col("value") / 100).select("event_id").collect()}
    assert ids1 == ids2  # deterministic
    # weight 0 keeps nothing; weight 1 keeps everything
    assert weighted_sample(events, "event_id", F.lit(0.0)).count() == 0
    assert weighted_sample(events, "event_id", F.lit(1.0)).count() == events.count()
    # keep rate tracks the mean clamped weight (hash is uniform)
    mean_w = events.select(F.avg(F.least(F.col("value") / 100, F.lit(1.0)))).first()[0]
    rate = len(ids1) / events.count()
    assert abs(rate - mean_w) < 0.1
