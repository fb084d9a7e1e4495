"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf dir, compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import os

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from baum_welch_spark.session import get_spark
from baum_welch_spark.sources.io import TABLES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # sort exact-comparable (non-float) columns FIRST: sorting by a float
    # column first would let sub-atol cross-engine noise reorder rows and
    # misalign the frames (spurious FAIL on the exact columns)
    order = [c for c in df.columns if df[c].dtype.kind != "f"] + [
        c for c in df.columns if df[c].dtype.kind == "f"
    ]
    df = df.sort_values(by=order, kind="mergesort").reset_index(drop=True)
    return df


def driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replica of the driver's canonicalization for rows-only faces: sort
    columns by name, then sort_values over ALL columns (multi-column
    sort_values lexsorts via factorize, which HASHES each value — an
    unhashable top-level cell like a list/dict/ndarray raises exactly the
    ``TypeError: unhashable type: 'list'`` that killed viterbi_topk in r7).
    Additionally reject unhashable cell types outright so single-column
    frames (where pandas takes the comparison-sort path and would not
    crash) still fail locally."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, dict, set)) or hasattr(v, "__array__"))
            if bad.any():
                t = type(df[c][bad.idxmax()]).__name__
                raise TypeError(f"unhashable/array cell type '{t}' in column {c!r}")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_kinds(df: pd.DataFrame) -> list[str]:
    """Coarse dtype kind per column. The driver's value hash canonicalizes
    int/float/object differently (e.g. DuckDB HUGEINT arrives as object or
    float64 while Spark BIGINT arrives as int64), so a kind mismatch can
    flip the hash even when values compare equal at atol — treat it as FAIL."""
    return [df[c].dtype.kind for c in df.columns]


def strict_mismatches(s: pd.DataFrame, o: pd.DataFrame, max_rows: int = 8) -> list[str]:
    """Driver-strength comparison on atol-aligned frames: the driver hashes
    canonical BYTE representations of every value, so `-0.0` vs `0.0`,
    differing NaN-ness, and sub-atol last-ulp drift all flip its gate even
    though `assert_frame_equal(atol=...)` treats them as equal (that gap is
    exactly how the emb_covariance red cell survived two local green runs,
    r4-r5). After the atol check passes, require repr-level equality —
    `repr(-0.0) == '-0.0' != '0.0'`, `repr(nan) == 'nan'` — and report any
    cell that differs."""
    out: list[str] = []
    for c in s.columns:
        if s[c].dtype.kind != "f":
            continue  # non-float columns were already compared exactly
        sv = [repr(float(x)) if pd.notna(x) else "nan" for x in s[c]]
        ov = [repr(float(x)) if pd.notna(x) else "nan" for x in o[c]]
        bad = [i for i, (a, b) in enumerate(zip(sv, ov)) if a != b]
        if bad:
            out.append(f"  column {c}: {len(bad)} byte-level differing cells")
            for i in bad[:max_rows]:
                key = {k: s[k][i] for k in s.columns if k != c and s[k].dtype.kind != "f"}
                out.append(f"    row {i}: spark={sv[i]} oracle={ov[i]}  (key: {key})")
    return out


def diff_report(s: pd.DataFrame, o: pd.DataFrame, max_rows: int = 12) -> str:
    """Value-level diff for a hash/value mismatch between aligned frames:
    lists the first rows whose values differ per column, with both values and
    the delta — near-boundary float flips (e.g. two engines rounding
    x.xxxxxx5 differently) are diagnosable straight from this output."""
    lines = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype.kind == "f":
            both_nan = sv.isna() & ov.isna()
            neq = ~both_nan & (sv.sub(ov).abs() > 1e-9)
        else:
            neq = sv.astype(str) != ov.astype(str)
        idx = list(s.index[neq][:max_rows])
        if not idx:
            continue
        lines.append(f"  column {c}: {int(neq.sum())} differing rows")
        for i in idx:
            if sv.dtype.kind == "f":
                d = float(sv[i]) - float(ov[i])
                lines.append(
                    f"    row {i}: spark={sv[i]!r} oracle={ov[i]!r} delta={d:.3e}"
                    f"  (key: {dict((k, s[k][i]) for k in s.columns if k != c and s[k].dtype.kind != 'f')})"
                )
            else:
                lines.append(f"    row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
    return "\n".join(lines) if lines else "  (no per-column differences above atol — ordering artifact?)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            # Rows-only faces still pass through the driver's canonicalizer
            # (sort all columns + value hash) — exactly where the r7
            # viterbi_topk array<int> schema crashed. Replicate that sort
            # here so an unhashable/unsortable top-level cell (list, dict,
            # ndarray) fails locally before the driver ever sees it.
            try:
                driver_canon(sdf)
            except Exception as e:
                failures.append(name)
                print(
                    f"FAIL {name}: rows-only output not canonicalizable "
                    f"(driver would crash): {type(e).__name__}: {e}"
                )
                continue
            print(f"ok   {name}: rows-only, {len(sdf)} rows  ({elapsed:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        s, o = normalize(sdf), normalize(odf)
        if list(s.columns) != list(o.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            failures.append(name)
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        sk, ok_kinds = dtype_kinds(s), dtype_kinds(o)
        if sk != ok_kinds:
            failures.append(name)
            mism = [
                f"{c}: spark={a} oracle={b}"
                for c, a, b in zip(s.columns, sk, ok_kinds)
                if a != b
            ]
            print(f"FAIL {name}: dtype-kind mismatch ({'; '.join(mism)})")
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            strict = strict_mismatches(s, o)
            if strict:
                failures.append(name)
                print(f"FAIL {name}: atol-equal but byte-level mismatch (driver hash would fail)")
                print("\n".join(strict))
                continue
            print(f"ok   {name}: {len(s)} rows match  ({elapsed:.1f}s)")
            if len(s) == 0 and name != "customers_without_orders":
                # an empty-vs-empty compare proves nothing about the operator
                # (customers_without_orders is legitimately empty at this sf)
                print(f"WARN {name}: zero rows on both sides (vacuous match)")
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL {name}: value mismatch\n{str(e)[:800]}")
            print(diff_report(s, o))
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
