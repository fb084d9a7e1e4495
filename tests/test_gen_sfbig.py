"""tools/gen_sfbig.py: the fresh-entity scale generator (§8.3j) must emit
the exact testdata schemas with consistent FKs and the planted dup rates —
a generator bug here silently invalidates the whole larger-scale board."""

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def test_gen_sfbig_schema_fks_and_planted_dups(tmp_path):
    from gen_sfbig import BASE, generate

    out = str(tmp_path / "big")
    generate(out, mult=1)
    con = duckdb.connect()

    src_cols = {
        t: con.sql(
            f"DESCRIBE SELECT * FROM '/root/testdata/sf0.1/{t}.parquet'"
        ).fetchall()
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split()
    }
    for t, cols in src_cols.items():
        got = con.sql(f"DESCRIBE SELECT * FROM '{out}/{t}.parquet'").fetchall()
        assert [(c[0], c[1]) for c in got] == [(c[0], c[1]) for c in cols], t

    # entity counts at mult=1 match the sf0.1 baseline; lineitem ~4/order
    for t, n in BASE.items():
        if t == "documents":
            continue  # planting preserves count, asserted below
        got_n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        if t == "orders":
            assert got_n == n
    n_li = con.sql(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0]
    assert 0.9 * 600_000 < n_li < 1.1 * 600_000

    # referential integrity: no orphan FKs anywhere
    for probe, ref in [
        (f"SELECT count(*) FROM '{out}/orders.parquet' o LEFT JOIN "
         f"'{out}/customer.parquet' c ON o.o_custkey = c.c_custkey "
         "WHERE c.c_custkey IS NULL", 0),
        (f"SELECT count(*) FROM '{out}/lineitem.parquet' l LEFT JOIN "
         f"'{out}/orders.parquet' o ON l.l_orderkey = o.o_orderkey "
         "WHERE o.o_orderkey IS NULL", 0),
        (f"SELECT count(*) FROM '{out}/lineitem.parquet' l LEFT JOIN "
         f"'{out}/part.parquet' p ON l.l_partkey = p.p_partkey "
         "WHERE p.p_partkey IS NULL", 0),
    ]:
        assert con.sql(probe).fetchone()[0] == ref

    # documents: count preserved, ~0.2% exact dups planted, vocab matches
    # the source corpus's own vocabulary
    n_doc, n_distinct = con.sql(
        f"SELECT count(*), count(DISTINCT md5(text)) FROM '{out}/documents.parquet'"
    ).fetchone()
    assert n_doc == BASE["documents"]
    assert n_doc - n_distinct == BASE["documents"] // 500
    extra = con.sql(
        f"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                       FROM '{out}/documents.parquet'),
               s AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS word
                     FROM '/root/testdata/sf0.1/documents.parquet')
           SELECT count(DISTINCT w.word) FROM w LEFT JOIN s USING (word)
           WHERE s.word IS NULL"""
    ).fetchone()[0]
    assert extra == 0

    # embeddings: 64-dim lists, labels 0..9, user_id range for events
    dim, lo, hi = con.sql(
        f"SELECT len(embedding), min(label), max(label) "
        f"FROM '{out}/embeddings.parquet' GROUP BY 1"
    ).fetchone()
    assert (dim, lo, hi) == (64, 0, 9)
    umax = con.sql(f"SELECT max(user_id) FROM '{out}/events.parquet'").fetchone()[0]
    assert umax < BASE["customer"] // 10
