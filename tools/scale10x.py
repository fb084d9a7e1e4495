"""10x scale validation (SURVEY §8.3 protocol, now a committed tool).

Builds a 10x replica of the sf0.1 tables into /tmp scratch — each replica
offsets every entity key by r * 10^ceil(log10(max_key + 1)) per key DOMAIN,
so cross-table joins stay consistent (replica-2 lineitems join replica-2
orders) and no keys collide. Constant-size dims (nation, region) are
copied, not replicated. Then times the named `queries()` entries against
both the original sf dir and the replica and prints the ratio: an operator
whose plan is scale-clean should grow at or below the 10x data ratio.

`--mutate` mode (SURVEY §8.3e): plain replication is ADVERSARIAL for the
near-dup operators — every doc gains (replicas - 1) identical twins, so the
TRUE-pair count grows ~replicas^2 and wall-clock measures output volume,
not plan behavior. With --mutate, replica r > 0 of every document gets a
replica-specific marker token ('zzq{r}') injected before every second word:
cross-replica pairs then share no word trigram (marker gaps < 3), no
11+-char winnowing span alignment beyond chance, differ by >> max_dist
edits, and start with different first words (the edit-blocking key) — so
true pairs stay ~linear in the data ratio and the measured ratio reflects
the plan, not the corpus's pair physics. Markers are POSITIONAL
('zq{r}x{i}', replica x word-index) rather than one token per replica: a
replica-global marker turns every (common-word, marker, common-word)
trigram into a replica-wide hot shingle and re-inflates candidate mass
through the side door (measured: containment 24.8x under 'zzq{r}' vs
linear under positional markers); positional markers only collide where
two docs share the same word at the same index — the same alignment a
genuine near-dup needs.

`--jitter` mode (SURVEY §8.3g addendum): plain replication is likewise
ADVERSARIAL for the embedding near-dup operators — every vector gains
(replicas - 1) exact clones, and at the faces' loose 0.35 threshold pair
OUTPUT is intrinsically ~n² anyway (pair density ~1.5e-3 on the synthetic
corpus), so the 10x board wall measures emitted-pair volume, not plan
behavior. With --jitter, replica r > 0 of every embedding gets
deterministic additive noise at relative norm EPS=1.6 (per-component
hash-uniform, seeded by (vec_id, r, i)): clone-to-original cosine drops to
1/sqrt(1+EPS^2) ~= 0.53 and clone-to-clone to 1/(1+EPS^2) ~= 0.28, both
under a 0.6 verify threshold — so at threshold 0.6 the TRUE pair set stays
sparse and a 1x-vs-10x timing isolates the plan's data-linear term
(sketch/bucket build + candidate join + verify of few). Measure with
tools/scale_embjitter.py, which calls the operators at threshold 0.6.

Usage:
  python tools/scale10x.py q7_volume_shipping q18_large_volume_customers
  python tools/scale10x.py --mutate --replicas 30 neardup_edit copy_pairs
  python tools/scale10x.py --jitter --rebuild  # embeddings-jittered replica
  python tools/scale10x.py --rebuild          # force dataset rebuild
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
MUTATE = False

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


#: --jitter relative noise norm: clone-original cos ~= 0.53, clone-clone
#: ~= 0.28 — both under the 0.6 measurement threshold (module docstring)
JITTER_EPS = 1.6


def build(
    con: duckdb.DuckDBPyConnection,
    dst: str,
    replicas: int,
    mutate: bool,
    jitter: bool = False,
) -> None:
    os.makedirs(dst, exist_ok=True)
    offs = {}
    for dom, (tbl, col) in DOMAIN_MAX.items():
        mx = con.sql(f"SELECT max({col}) FROM '{SRC}/{tbl}.parquet'").fetchone()[0]
        k = 1
        while k <= mx:
            k *= 10
        offs[dom] = k
    for tbl in COPY_ONLY:
        con.sql(f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{dst}/{tbl}.parquet'")
    for tbl, doms in KEYED.items():
        if tbl == "documents" and mutate:
            off = offs["dockey"]
            con.sql(
                f"""COPY (
  WITH src AS (
    SELECT d.doc_id, d.text, d.lang, d.source, r.r
    FROM '{SRC}/documents.parquet' d, range({replicas}) r(r)
  ),
  tok AS (
    SELECT doc_id, r, lang, source,
           unnest(string_split(text, ' ')) AS w,
           unnest(range(len(string_split(text, ' ')))) AS i
    FROM src
  ),
  mut AS (
    SELECT doc_id, r, lang, source,
           string_agg(
             CASE WHEN r > 0 AND i % 2 = 0
                  THEN 'zq' || r || 'x' || i || ' ' || w ELSE w END,
             ' ' ORDER BY i) AS text
    FROM tok GROUP BY doc_id, r, lang, source
  )
  SELECT doc_id + r * {off} AS doc_id, text, lang, source,
         length(text) AS n_chars
  FROM mut
) TO '{dst}/documents.parquet'"""
            )
            continue
        if tbl == "embeddings" and jitter:
            off = offs["veckey"]
            # deterministic per-(vec_id, replica, component) uniform noise in
            # [-sqrt(3), sqrt(3)] scaled to relative vector norm JITTER_EPS:
            # E|noise|^2 = EPS^2 * (|v|/sqrt(dim))^2 * dim = EPS^2 * |v|^2.
            # r = 0 keeps the original vectors bit-exact.
            con.sql(
                f"""COPY (
  SELECT e.vec_id + r.r * {off} AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding ELSE
           list_transform(
             e.embedding,
             (x, i) -> CAST(x + {JITTER_EPS} * sqrt(list_sum(list_transform(e.embedding, y -> y * y)) / len(e.embedding))
                  * 1.7320508 * (CAST(hash(e.vec_id * 1000003 + r.r * 131 + i) % 2001 AS DOUBLE) / 1000.0 - 1.0)
               AS FLOAT))
         END AS embedding,
         e.label
  FROM '{SRC}/embeddings.parquet' e, range({replicas}) r(r)
) TO '{dst}/embeddings.parquet'"""
            )
            continue
        cols = con.sql(f"SELECT * FROM '{SRC}/{tbl}.parquet' LIMIT 0").columns
        shifted = dict()
        for dom, cs in doms.items():
            for c in cs:
                shifted[c] = f"({c} + r.r * {offs[dom]}) AS {c}"
        sel = ", ".join(shifted.get(c, c) for c in cols)
        con.sql(
            f"COPY (SELECT {sel} FROM '{SRC}/{tbl}.parquet', "
            f"range({replicas}) r(r)) TO '{dst}/{tbl}.parquet'"
        )
    print(f"built {dst} ({replicas}x {SRC}{', mutated docs' if mutate else ''})", file=sys.stderr)


def main() -> int:
    argv = sys.argv[1:]
    replicas = REPLICAS
    if "--replicas" in argv:
        i = argv.index("--replicas")
        replicas = int(argv[i + 1])
        del argv[i : i + 2]
    mutate = "--mutate" in argv
    jitter = "--jitter" in argv
    rebuild = "--rebuild" in argv
    args = [a for a in argv if a not in ("--rebuild", "--mutate", "--jitter")]
    dst = os.environ.get(
        "SPARK_GRAFT_10X_DIR",
        f"/tmp/sf0.1_x{replicas}{'_mut' if mutate else ''}{'_jit' if jitter else ''}",
    )
    con = duckdb.connect()
    if rebuild or not os.path.exists(f"{dst}/lineitem.parquet"):
        build(con, dst, replicas, mutate, jitter)

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
        big = f"{replicas}x{'_mut' if mutate else ''}"
        for label, sf in (("sf0.1", SRC), (big, dst)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = best
        ratio = times[big] / times["sf0.1"]
        print(f"{name}: sf0.1 {times['sf0.1']:.1f}s  {big} {times[big]:.1f}s  ratio {ratio:.1f}x")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
