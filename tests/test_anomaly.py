"""MAD outliers (operators/anomaly.py): NumPy median/MAD oracle, zero-MAD
group skip, and robustness (the planted outlier itself must not move the
cutoff the way it would a mean/stddev z-score)."""

import numpy as np
from pyspark.sql import functions as F

from baum_welch_spark.operators.anomaly import MAD_SIGMA, mad_outliers


def _frame(spark, rows):
    return spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)],
        schema="event_id bigint, event_type string, value double",
    )


def test_mad_outliers_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = []
    for g, (mu, sd) in (("a", (10, 2)), ("b", (100, 30))):
        rows += [(g, v) for v in rng.normal(mu, sd, 200)]
    rows += [("a", 1e6), ("a", -1e6), ("b", 1e7)]  # planted outliers
    df = _frame(spark, rows)
    got = {r.event_id: round(r.score, 6) for r in mad_outliers(df).collect()}

    vals = {}
    for i, (g, v) in enumerate(rows):
        vals.setdefault(g, []).append((i, v))
    expect = {}
    for g, pairs in vals.items():
        v = np.array([x for _, x in pairs])
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        for i, x in pairs:
            score = abs(x - med) / (MAD_SIGMA * mad)
            if abs(x - med) > 3.5 * MAD_SIGMA * mad:
                expect[i] = round(score, 6)
    assert got == expect
    # the planted extremes are flagged (robustness: with mean/stddev the
    # 1e6 points would inflate sigma enough to hide each other)
    planted = {len(rows) - 3, len(rows) - 2, len(rows) - 1}
    assert planted <= set(got)


def test_mad_outliers_skips_zero_mad_groups(spark):
    # >half identical -> MAD == 0 -> the group is skipped, not exploded
    rows = [("c", 5.0)] * 10 + [("c", 9.0)] + [("d", 1.0), ("d", 2.0), ("d", 50.0)]
    out = mad_outliers(_frame(spark, rows)).collect()
    assert all(r.grp == "d" for r in out)
    assert [r.value for r in out] == [50.0]
