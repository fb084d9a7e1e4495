"""10x scale validation (SURVEY §8.3 protocol, now a committed tool).

Builds a 10x replica of the sf0.1 tables into /tmp scratch — each replica
offsets every entity key by r * 10^ceil(log10(max_key + 1)) per key DOMAIN,
so cross-table joins stay consistent (replica-2 lineitems join replica-2
orders) and no keys collide. Constant-size dims (nation, region) are
copied, not replicated. Then times the named `queries()` entries against
both the original sf dir and the replica and prints the ratio: an operator
whose plan is scale-clean should grow at or below the 10x data ratio.

Usage:
  python tools/scale10x.py q7_volume_shipping q18_large_volume_customers
  python tools/scale10x.py --rebuild          # force dataset rebuild
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_10X_DIR", "/tmp/sf0.1_x10")
REPLICAS = 10

# key domains to offset, per table (domain name -> columns in that table)
KEYED = {
    "orders": {"orderkey": ["o_orderkey"], "custkey": ["o_custkey"]},
    "lineitem": {
        "orderkey": ["l_orderkey"],
        "partkey": ["l_partkey"],
        "suppkey": ["l_suppkey"],
    },
    "customer": {"custkey": ["c_custkey"]},
    "supplier": {"suppkey": ["s_suppkey"]},
    "part": {"partkey": ["p_partkey"]},
    "events": {"eventkey": ["event_id"], "userkey": ["user_id"]},
    "documents": {"dockey": ["doc_id"]},
    "embeddings": {"veckey": ["vec_id"]},
}
COPY_ONLY = ["nation", "region"]

# which source table defines each domain's max
DOMAIN_MAX = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "eventkey": ("events", "event_id"),
    "userkey": ("events", "user_id"),
    "dockey": ("documents", "doc_id"),
    "veckey": ("embeddings", "vec_id"),
}


def build(con: duckdb.DuckDBPyConnection) -> None:
    os.makedirs(DST, exist_ok=True)
    offs = {}
    for dom, (tbl, col) in DOMAIN_MAX.items():
        mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        k = 1
        while k <= mx:
            k *= 10
        offs[dom] = k
    for tbl in COPY_ONLY:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{DST}/{tbl}.parquet'")
    for tbl, doms in KEYED.items():
        cols = con.sql(f"SELECT * FROM '{SRC}/{tbl}.parquet' LIMIT 0").columns
        shifted = dict()
        for dom, cs in doms.items():
            for c in cs:
                shifted[c] = f"({c} + r.r * {offs[dom]}) AS {c}"
        sel = ", ".join(shifted.get(c, c) for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{tbl}.parquet', "
            f"range({REPLICAS}) r(r)) TO '{DST}/{tbl}.parquet'"
        )
    print(f"built {DST} ({REPLICAS}x {SRC})", file=sys.stderr)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--rebuild"]
    rebuild = "--rebuild" in sys.argv
    con = duckdb.connect()
    if rebuild or not os.path.exists(f"{DST}/lineitem.parquet"):
        build(con)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    )
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    qs = em.queries()

    from baum_welch_spark.session import get_spark

    spark = get_spark(app_name="scale10x")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Arrow workers so the first query doesn't absorb spin-up
    qs["q1_pricing_summary"](spark, SRC).write.format("noop").mode("overwrite").save()

    for name in args:
        if name not in qs:
            print(f"{name}: unknown query", file=sys.stderr)
            continue
        times = {}
        for label, sf in (("sf0.1", SRC), ("10x", DST)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = best
        ratio = times["10x"] / times["sf0.1"]
        print(f"{name}: sf0.1 {times['sf0.1']:.1f}s  10x {times['10x']:.1f}s  ratio {ratio:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
