"""Fresh-entity larger-scale dataset generator (SURVEY §8.3j, VERDICT-r10 #5).

The §8.3g whole-board 10x run proved no cross-face interference under
REPLICATION — but a replica grows row count while freezing the things that
actually move shuffle width and state size: key cardinality, group counts,
distinct-value counts (a 10x replica has 10x customers but each still has
the same orders; dims replicate in lockstep). This tool synthesizes a
genuinely larger dataset with FRESH entities at every level — 10x the
sf0.1 entity counts by default (sf1-shaped: 150k customers, 1.5M orders,
6M lineitems, 1M events over 15k users, 50k documents, 20k embeddings) —
drawn from the same distribution shapes as the driver's generator
(empirically matched: marginals, FK fan-outs, date windows, the 31-word
document vocabulary, the ~0.2% planted exact-dup rate), so every face runs
against data where groupBy cardinality, join-key spread, and distinct-value
growth are all 10x real, not cloned.

Shapes matched against /root/testdata/sf0.1 (read-only; never modified):
  customer/supplier/part  uniform dims, Customer#%09d-style names
  orders     uniform custkey fan-in, F/O/P status, 1995..2001-08 dates
  lineitem   1+Poisson(3) lines/order (clipped to the observed 1..17),
             qty 1..50, extprice ~ qty x unit(900..2100), ship = order+1..95d
  events     30-day window, exponential(mean 50) value, props {"k": 0..99}
  documents  word-soup over the corpus's own vocabulary grown by
             mult^(1/3) (Heaps-law scaling: keeps docs-per-trigram constant
             so the text family measures plan scaling, not trigram-collision
             physics — see the inline comment), source length bootstrap,
             41/15/15/15/14 lang split, 20 sources, 0.2% exact dups + 0.5%
             one-word-in-ten mutated near-dups
  embeddings 64-dim iid N(0,1) float32, label 0..9 (the source corpus has
             no cluster structure — measured intra/inter label cosine ~0)

region/nation are constant dims and are COPIED from the source dir (the
scale10x convention). Deterministic (seed 271828 + per-table offsets).

Usage:
  python tools/gen_sfbig.py                 # /tmp/sf1_fresh at 10x sf0.1
  python tools/gen_sfbig.py --mult 3 --out /tmp/sf03_fresh
Then run the board against it with the sidecar-isolated bench:
  SPARK_GRAFT_SF_DIR=/tmp/sf1_fresh python bench.py
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJ = ["large", "hot", "blue", "small", "dim", "spring", "metallic", "cold"]
NOUN = ["ring", "bolt", "gear", "cap", "tube", "disk", "plate", "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = (["en"], ["zh", "es", "fr", "de"])
DAY_US = 86_400_000_000


def _ts(us_since_epoch: np.ndarray) -> pa.Array:
    return pa.array(us_since_epoch.astype("int64"), type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _doc_vocab_and_lengths() -> tuple[list[str], np.ndarray]:
    """The source corpus's own vocabulary and word-count distribution —
    bootstrap inputs so the text family sees the same shingle physics."""
    import duckdb

    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{SRC}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    lens = np.array(
        [
            r[0]
            for r in con.sql(
                f"SELECT len(string_split(text, ' ')) FROM '{SRC}/documents.parquet'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    return vocab, lens


def generate(out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)
    for dim in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{dim}.parquet"), out)
        print(f"  {dim}: copied (constant dim)")

    n_cust = BASE["customer"] * mult
    n_supp = BASE["supplier"] * mult
    n_part = BASE["part"] * mult
    n_ord = BASE["orders"] * mult
    n_evt = BASE["events"] * mult
    n_doc = BASE["documents"] * mult
    n_emb = BASE["embeddings"] * mult
    n_users = n_cust // 10  # events.user_id spans c_custkey/10 like the source

    rng = np.random.default_rng(271828)
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000.0, 10000.0, n_supp), 2),
    }))

    adj = np.array(ADJ)[rng.integers(0, len(ADJ), n_part)]
    noun = np.array(NOUN)[rng.integers(0, len(NOUN), n_part)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), type=pa.int64()),
        "p_name": pa.array(np.char.add(np.char.add(adj, " "), noun)),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 1000.0, n_part), 2),
    }))

    t0 = np.datetime64("1995-01-01", "us").astype("int64")
    t1 = np.datetime64("2001-08-01", "us").astype("int64")
    odate_us = rng.integers(t0 // DAY_US, t1 // DAY_US + 1, n_ord) * DAY_US
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), type=pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), type=pa.int64()),
        "o_orderstatus": pa.array(np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_ord), 2),
        "o_orderdate": _ts(odate_us),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    lines = np.clip(1 + rng.poisson(3.0, n_ord), 1, 17)
    lkey = np.repeat(np.arange(n_ord), lines)
    n_li = lkey.shape[0]
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lkey, type=pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(rng.integers(0, 8, n_li), type=pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2),
        "l_discount": np.round(rng.uniform(0.0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0.0, 0.08, n_li), 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts(np.repeat(odate_us, lines) + rng.integers(1, 96, n_li) * DAY_US),
    }))

    e0 = np.datetime64("2024-01-01", "us").astype("int64")
    e1 = np.datetime64("2024-01-31", "us").astype("int64")
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), type=pa.int64()),
        "ts": _ts(np.sort(rng.integers(e0, e1, n_evt))),
        "user_id": pa.array(rng.integers(0, n_users, n_evt), type=pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    vocab, src_lens = _doc_vocab_and_lengths()
    # Heaps-law vocabulary scaling: the source's 31-word vocabulary over 10x
    # the documents would grow trigram-collision PAIR count ~mult^2 (every
    # trigram's doc fan-out grows with mult; measured: the fixed-vocab 10x
    # corpus ground the exact-Jaccard family into the hundreds of millions
    # of candidate pairs — corpus physics, not plan behavior, the same trap
    # scale10x's --mutate mode exists to avoid). Growing the vocabulary by
    # mult^(1/3) keeps the trigram space ~mult-proportional and docs-per-
    # trigram constant, so the text family measures plan scaling. Extra
    # words are digit-suffixed variants of source words (same length shape).
    target_v = int(np.ceil(len(vocab) * mult ** (1.0 / 3.0)))
    extra = []
    suffix = 2
    while len(vocab) + len(extra) < target_v:
        extra.extend(f"{w}{suffix}" for w in vocab)
        suffix += 1
    varr = np.array(vocab + extra[: target_v - len(vocab)])
    lens_d = src_lens[rng.integers(0, len(src_lens), n_doc)]
    texts: list[str] = []
    for ln in lens_d:
        texts.append(" ".join(varr[rng.integers(0, len(varr), int(ln))]))
    # planted exact dups (~0.2%) and one-word-in-ten mutated near-dups
    # (~0.5%) — fresh pairs, not clones of the whole corpus. Both planting
    # passes OVERWRITE docs in the upper half with (mutated) copies of
    # lower-half docs, so corpus size is unchanged and each planted doc has
    # exactly one partner; the two target id sets are disjoint.
    upper = rng.permutation(np.arange(n_doc // 2, n_doc))
    n_exact = max(1, n_doc // 500)
    n_near = max(1, n_doc // 200)
    for i in upper[:n_exact]:
        texts[int(i)] = texts[int(rng.integers(0, n_doc // 2))]
    for i in upper[n_exact : n_exact + n_near]:
        mut = texts[int(rng.integers(0, n_doc // 2))].split()
        for j in range(0, len(mut), 10):
            mut[j] = varr[int(rng.integers(0, len(varr)))]
        texts[int(i)] = " ".join(mut)
    n_doc_f = len(texts)
    lang_pick = rng.random(n_doc_f)
    langs = np.where(
        lang_pick < 0.41, "en", np.array(LANGS[1])[rng.integers(0, 4, n_doc_f)]
    )
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc_f), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_doc_f)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), type=pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), type=pa.int64()),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), type=pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10, help="multiple of sf0.1 entity counts")
    ap.add_argument("--out", default="/tmp/sf1_fresh")
    args = ap.parse_args()
    print(f"generating fresh-entity dataset at {args.out} (mult={args.mult})")
    generate(args.out, args.mult)
    print("done")
