"""Portable-sketch properties: the HLL and sampled-quantile operators must be
(a) accurate within their published bounds and (b) mergeable / deterministic —
the two properties that make a sketch usable at 100 TB (map-side combine and
cross-run reproducibility). Cross-engine exactness is pinned separately by the
driver oracle (tools/check_oracle.py: hll_distinct_users /
value_sampled_quantiles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF001


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF001}/events.parquet")


def test_hll_estimate_within_error_bound(spark, events):
    # m = 64 -> relative standard error 1.04/sqrt(64) ~ 13%; allow 3 sigma.
    from baum_welch_spark.operators.sketches import hll_distinct_users

    rows = hll_distinct_users(events).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.hll_est - r.n_exact) / r.n_exact < 0.39, r


def test_hll_high_cardinality_and_register_bounds(spark, events):
    # event_id is the high-cardinality key (every row distinct): the raw
    # estimator path (no linear counting) must hold its bound too, and every
    # register must stay in the capped rank range that makes the harmonic
    # sum exact integer arithmetic.
    from baum_welch_spark.operators.sketches import (
        HLL_M,
        HLL_RHO_CAP,
        hll_estimate,
        hll_registers,
    )

    df = events.withColumn("g", F.lit("all"))
    reg = hll_registers(df, "event_id", ["g"])
    stats = reg.agg(
        F.min("rho"), F.max("rho"), F.count(F.lit(1)), F.min("bucket"), F.max("bucket")
    ).first()
    assert stats[0] >= 1 and stats[1] <= HLL_RHO_CAP
    assert stats[2] <= HLL_M and 0 <= stats[3] and stats[4] < HLL_M
    n_exact = events.select("event_id").distinct().count()
    est = hll_estimate(reg, ["g"]).first().hll_est
    assert abs(est - n_exact) / n_exact < 0.39


def test_hll_registers_merge_exactly(spark, events):
    # Union two disjoint halves' register tables and re-max: identical
    # registers (hence identical estimate) to sketching the whole — the
    # map-side-combine property, asserted exactly.
    from baum_welch_spark.operators.sketches import hll_registers

    df = events.withColumn("g", F.lit("all"))
    whole = hll_registers(df, "user_id", ["g"])
    a = hll_registers(df.filter(F.col("event_id") % 2 == 0), "user_id", ["g"])
    b = hll_registers(df.filter(F.col("event_id") % 2 == 1), "user_id", ["g"])
    merged = a.unionByName(b).groupBy("g", "bucket").agg(F.max("rho").alias("rho"))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_sampled_quantiles_accuracy_and_determinism(spark, events):
    from baum_welch_spark.operators.sampling import sampled_quantiles

    rows = sampled_quantiles(events).collect()
    assert len(rows) > 0
    for r in rows:
        # 20% sample of ~6k rows/group: the p50 estimate sits well inside
        # the value spread; generous bound, this is a smoke bound not a CI.
        assert abs(r.p50_est - r.p50) <= 0.3 * max(abs(r.p50), 1.0), r
        assert abs(r.p95_est - r.p95) <= 0.3 * max(abs(r.p95), 1.0), r
    again = sampled_quantiles(events).collect()
    assert rows == again


def test_streaming_hll_registers_equal_batch(spark, events):
    """The streaming register table must equal the batch one exactly (max
    is order-insensitive), which is what lets the streaming face share the
    batch face's DuckDB oracle verbatim."""
    from baum_welch_spark.operators.sketches import hll_registers
    from baum_welch_spark.streaming.heavyhitters import streaming_hll_registers
    from baum_welch_spark.streaming.sessionize import run_to_memory, stream_events

    run_to_memory(
        streaming_hll_registers(stream_events(spark, f"{SF001}")),
        "hll_reg_stream_test",
    )
    got = {
        (r.event_type, r.bucket): r.rho
        for r in spark.table("hll_reg_stream_test").collect()
    }
    want = {
        (r.event_type, r.bucket): r.rho
        for r in hll_registers(events, "user_id", ["event_type"]).collect()
    }
    assert got == want


def test_hll_overlap_disjoint_and_identical_audiences(spark):
    from baum_welch_spark.operators.sketches import hll_overlap

    # disjoint audiences: union est = both sets' combined estimate, so
    # inclusion-exclusion must land near zero (within sketch error);
    # identical audiences: union == each side, overlap == the estimate
    rows = [(k, "A") for k in range(1000)] + [(k, "B") for k in range(1000, 2000)]
    rows += [(k, "C") for k in range(1000)]  # C duplicates A's audience
    df = spark.createDataFrame(rows, schema="k bigint, t string")
    got = {(r.type_a, r.type_b): r for r in hll_overlap(df, "k", "t").collect()}
    ab = got[("A", "B")]
    assert ab.n_exact_overlap == 0
    # 3-sigma at m=64 is ~39% of 1000; disjoint overlap must be far below
    # the identical-audience overlap
    ac = got[("A", "C")]
    assert ac.n_exact_overlap == 1000
    assert ac.est_union == ac.est_a == ac.est_b  # identical register tables
    assert ac.overlap_est == ac.est_a
    assert abs(ab.overlap_est) < 0.5 * ac.overlap_est


def test_hll_overlap_union_est_matches_combined_scan(spark):
    from baum_welch_spark.operators.sketches import (
        hll_estimate,
        hll_overlap_custs,
        hll_registers,
    )

    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    got = {(r.type_a, r.type_b): r for r in hll_overlap_custs(orders).collect()}
    # sketch-union exactness: the pairwise max-merged registers must give
    # the SAME estimate as re-scanning the union of the two classes' rows
    for ta, tb in [("1-URGENT", "2-HIGH"), ("3-MEDIUM", "5-LOW")]:
        both = orders.filter(F.col("o_orderpriority").isin([ta, tb])).select(
            F.col("o_custkey").alias("k"), F.lit("u").alias("t")
        )
        est = hll_estimate(hll_registers(both, "k", ["t"]), ["t"]).collect()[0].hll_est
        assert got[(ta, tb)].est_union == est, (ta, tb)
        r = got[(ta, tb)]
        assert r.overlap_est == r.est_a + r.est_b - r.est_union
