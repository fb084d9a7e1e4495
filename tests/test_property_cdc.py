"""Property-based pin for the bucketed CDC merge semantics
(streaming/upsert.py): for ARBITRARY change-logs — random keys, ops,
batch boundaries, and per-batch column subsets (partial updates +
widening) — sequential merge_batch application must equal a pure-Python
reference implementing the module contract: per-batch last-writer-wins
collapse, then matched+upsert -> set the batch's columns / preserve the
rest, matched+delete -> drop, unmatched+upsert -> insert with NULL for
unset columns. The demo faces pin one deterministic log shape against
DuckDB; this pins the general semantics the docstrings promise."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# one batch row: (key, op, value-for-v, value-for-w)
_row = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["upsert", "upsert", "upsert", "delete"]),
    st.integers(min_value=-9, max_value=9),
    st.integers(min_value=-9, max_value=9),
)
# one batch: the column subset it sets + its rows
_batch = st.tuples(
    st.sampled_from([("v",), ("w",), ("v", "w")]),
    st.lists(_row, min_size=1, max_size=5),
)
_log = st.lists(_batch, min_size=1, max_size=3)


def _apply_reference(batches):
    """The documented semantics, in plain Python."""
    all_cols: list[str] = []
    state: dict[int, dict] = {}
    ts = 0
    stamped = []
    for cols, rows in batches:
        b = []
        for k, op, v, w in rows:
            ts += 1  # globally unique, increasing (the module's ts contract)
            b.append((k, op, {"v": float(v), "w": float(w)}, ts))
        stamped.append((cols, b))
    for cols, rows in stamped:
        for c in cols:
            if c not in all_cols:
                all_cols.append(c)
        winners: dict[int, tuple] = {}
        for k, op, vals, t in rows:
            if k not in winners or t > winners[k][3]:
                winners[k] = (k, op, vals, t)
        for k, (_, op, vals, _t) in winners.items():
            if op == "delete":
                state.pop(k, None)
            else:
                row = state.get(k, {})
                new = {c: row.get(c) for c in all_cols}
                for c in cols:
                    new[c] = vals[c]
                state[k] = new
    # the read contract null-backfills every row to the FINAL evolved
    # column list (rows written before a widening lack the new column)
    return all_cols, {
        k: {c: row.get(c) for c in all_cols} for k, row in state.items()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_log)
def test_merge_batch_matches_reference_semantics(spark, tmp_path_factory, batches):
    from baum_welch_spark.streaming.upsert import merge_batch, read_snapshot

    snap = str(tmp_path_factory.mktemp("prop") / "snap")
    ts = 0
    for cols, rows in batches:
        data = []
        for k, op, v, w in rows:
            ts += 1
            vals = {"v": float(v), "w": float(w)}
            data.append((k, *[vals[c] for c in cols], op, ts))
        schema = (
            "k long, "
            + ", ".join(f"{c} double" for c in cols)
            + ", op string, ts long"
        )
        merge_batch(
            spark,
            spark.createDataFrame(data, schema),
            snap,
            "k",
            list(cols),
            n_buckets=4,
        )
    all_cols, expect = _apply_reference(batches)
    df = read_snapshot(spark, snap)
    if not expect:
        assert df is None or df.count() == 0
        return
    assert df.columns == ["k", *all_cols]
    got = {}
    for r in df.collect():
        d = r.asDict()
        got[d.pop("k")] = {
            c: (None if d[c] is None or (isinstance(d[c], float) and math.isnan(d[c])) else d[c])
            for c in all_cols
        }
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_log)
def test_versioned_reads_and_diff_match_reference(spark, tmp_path_factory, batches):
    """Time travel + CDF over ARBITRARY logs: read_snapshot_at(k) equals
    the reference state after k batches under version-k's (possibly
    narrower) column list, and snapshot_diff(v1, v2) equals a brute-force
    diff of the two versioned reads — including across widening
    boundaries, where the from side null-backfills."""
    from baum_welch_spark.streaming.upsert import (
        merge_batch,
        read_snapshot_at,
        snapshot_diff,
    )

    snap = str(tmp_path_factory.mktemp("prop") / "snap")
    n = len(batches)
    ts = 0
    for cols, rows in batches:
        data = []
        for k, op, v, w in rows:
            ts += 1
            vals = {"v": float(v), "w": float(w)}
            data.append((k, *[vals[c] for c in cols], op, ts))
        schema = (
            "k long, "
            + ", ".join(f"{c} double" for c in cols)
            + ", op string, ts long"
        )
        merge_batch(
            spark, spark.createDataFrame(data, schema), snap, "k",
            list(cols), n_buckets=4, retain=n + 1,
        )

    # reference states per version, under that version's column list
    def ref_states():
        out = []
        all_cols: list[str] = []
        state: dict[int, dict] = {}
        t = 0
        for cols, rows in batches:
            for c in cols:
                if c not in all_cols:
                    all_cols.append(c)
            winners = {}
            for k, op, v, w in rows:
                t += 1
                winners[k] = (op, {"v": float(v), "w": float(w)}, t)
            for k, (op, vals, _t) in winners.items():
                if op == "delete":
                    state.pop(k, None)
                else:
                    row = state.get(k, {})
                    new = {c: row.get(c) for c in all_cols}
                    for c in cols:
                        new[c] = vals[c]
                    state[k] = new
            out.append((
                list(all_cols),
                {k: {c: r.get(c) for c in all_cols} for k, r in state.items()},
            ))
        return out

    refs = ref_states()
    for ver in range(1, n + 1):
        cols_v, want = refs[ver - 1]
        df = read_snapshot_at(spark, snap, ver)
        if not want:
            assert df is None or df.count() == 0
            continue
        assert df.columns == ["k", *cols_v]
        got = {
            r["k"]: {c: r[c] for c in cols_v}
            for r in (x.asDict() for x in df.collect())
        }
        assert got == want, f"version {ver}"

    # CDF v1 -> vN against a brute-force diff of the two reference states
    if n >= 2:
        cols_to = refs[-1][0]
        a, b = refs[0][1], refs[-1][1]

        def at(state, k, c):
            return state[k].get(c) if k in state else None

        expect = {}
        for k in set(a) | set(b):
            if k in a and k not in b:
                expect[k] = ("delete",)
            elif k not in a and k in b:
                expect[k] = ("insert",)
            elif any(at(a, k, c) != at(b, k, c) for c in cols_to):
                expect[k] = ("update",)
        d = snapshot_diff(spark, snap, 1, n, key="k", value_cols=cols_to)
        got = {}
        for r in (x.asDict() for x in d.collect()):
            got[r["k"]] = (r["op"],)
            for c in cols_to:
                assert r[f"old_{c}"] == at(a, r["k"], c), (r, c)
                assert r[f"new_{c}"] == at(b, r["k"], c), (r, c)
        assert got == expect


# one composite-key batch row: ((k1, k2), op, value)
_crow = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.sampled_from(["x", "y"]),
    st.sampled_from(["upsert", "upsert", "upsert", "delete"]),
    st.integers(min_value=-9, max_value=9),
)
_clog = st.lists(st.lists(_crow, min_size=1, max_size=5), min_size=1, max_size=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_clog)
def test_merge_batch_composite_key_matches_reference(spark, tmp_path_factory, batches):
    """The r9 composite-key contract under ARBITRARY logs: last-writer-wins
    and the merge operate on the full (k1, k2) tuple — (0, 'x') and
    (0, 'y') are independent rows, which is exactly what a single-column
    key cannot express."""
    from baum_welch_spark.streaming.upsert import merge_batch, read_snapshot

    snap = str(tmp_path_factory.mktemp("propc") / "snap")
    state: dict[tuple, float] = {}
    ts = 0
    for rows in batches:
        data, winners = [], {}
        for k1, k2, op, v in rows:
            ts += 1
            data.append((k1, k2, float(v), op, ts))
            kk = (k1, k2)
            if kk not in winners or ts > winners[kk][2]:
                winners[kk] = (op, float(v), ts)
        merge_batch(
            spark,
            spark.createDataFrame(
                data, "k1 long, k2 string, v double, op string, ts long"
            ),
            snap,
            ["k1", "k2"],
            ["v"],
            n_buckets=4,
        )
        for kk, (op, v, _t) in winners.items():
            if op == "delete":
                state.pop(kk, None)
            else:
                state[kk] = v
    df = read_snapshot(spark, snap)
    got = {} if df is None else {(r.k1, r.k2): r.v for r in df.collect()}
    assert got == state
