"""As-of join: semantics vs pandas merge_asof, plus the oracle instance."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.asof import asof_join, purchases_with_last_view
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


def test_asof_join_matches_merge_asof(spark):
    left = [(1, 10, 100), (1, 20, 101), (1, 5, 102), (2, 7, 103)]
    right = [(1, 9, 0.5), (1, 10, 0.7), (1, 19, 0.9), (2, 8, 1.1)]
    ldf = spark.createDataFrame(left, "k bigint, t bigint, lid bigint")
    rdf = spark.createDataFrame(right, "k bigint, t bigint, payload double")
    got = {
        r.lid: r.asof_payload
        for r in asof_join(ldf, rdf, on="k", ts="t", seq="lid").collect()
    }
    lp = pd.DataFrame(left, columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame(right, columns=["k", "t", "payload"]).sort_values("t")
    exp = pd.merge_asof(lp, rp, on="t", by="k", allow_exact_matches=False)
    for _, row in exp.iterrows():
        a_p = got[row.lid]
        if pd.isna(row.payload):
            assert a_p is None, row.lid
        else:
            assert a_p == row.payload, row.lid


def test_purchases_with_last_view_strict_before(spark):
    events = load_table(spark, SF0001, "events")
    out = purchases_with_last_view(events).collect()
    n_purchases = events.filter(F.col("event_type") == "purchase").count()
    assert len(out) == n_purchases
    for r in out:
        if r.view_ts_us is not None:
            assert r.view_ts_us < r.ts_us  # strictly before
