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


def test_mad_outliers_approx_agrees_at_sf01(spark):
    """The documented 100 TB swap-in (approx_percentile) is load-bearing
    (VERDICT-r9 #7): at sf0.1 the sketch-based variant must reproduce the
    exact variant's flag set almost perfectly — disagreement is only
    possible for rows whose score sits within the sketch's rank error of
    the k-cutoff, so demand >= 99% Jaccard agreement and that every
    disagreeing row scores within 5% of the cutoff."""
    from baum_welch_spark.operators.anomaly import mad_outliers_approx
    from baum_welch_spark.sources.io import load_table

    events = load_table(spark, "/root/testdata/sf0.1", "events")
    exact = {r.event_id: r.score for r in mad_outliers(events).collect()}
    approx = {r.event_id: r.score for r in mad_outliers_approx(events).collect()}
    assert exact, "exact variant must flag something at sf0.1"
    both = set(exact) & set(approx)
    union = set(exact) | set(approx)
    assert len(both) / len(union) >= 0.99
    k = 3.5
    for eid in union - both:
        score = exact.get(eid) or approx.get(eid)
        assert abs(score - k) / k < 0.05, (
            f"row {eid} flagged by only one variant but scores {score}, "
            f"not near the cutoff {k}"
        )
