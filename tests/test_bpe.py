"""BPE trainer tests: exact merge-sequence parity with an in-memory
reference implementation, plus encoder properties."""

from collections import Counter

import pytest

from baum_welch_spark.operators.bpe import EOW, bpe_encode, bpe_merges, bpe_train
from baum_welch_spark.sources.io import load_table

from conftest import SF0001


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Straight-line reference BPE (Sennrich): greedy max-pair merges with
    (freq desc, left asc, right asc) tie-break."""
    vocab = {tuple(list(w) + [EOW]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), f = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if f < 2:
            break
        merges.append((l, r, f))
        new_vocab = {}
        for syms, fq in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + fq
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF0001, "documents").cache()


def test_bpe_train_matches_reference(spark):
    texts = [
        (0, "low low low lower lower newest newest newest newest widest widest"),
        (1, "low lower newest widest newest low"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    freqs = Counter(w for _, t in texts for w in t.lower().split())
    got = bpe_train(df, n_merges=12)
    want = _reference_bpe(freqs, 12)
    assert got == want, (got, want)


def test_bpe_train_deterministic_across_partitionings(spark, documents):
    a = bpe_train(documents, n_merges=8)
    b = bpe_train(documents.repartition(7), n_merges=8)
    assert a == b


def test_bpe_encode_properties(spark):
    texts = [(0, "aa aa aa aa bb"), (1, "aa bb aa")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    # no merges: every word costs len(word) + 1 (EOW symbol)
    none = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(df, []).collect()}
    assert none == {0: 5 * 3, 1: 3 * 3}
    # trained merges compress: token count strictly drops, never below word count
    merges = bpe_train(df, n_merges=6)
    enc = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(df, merges).collect()}
    assert enc[0] < none[0] and enc[1] < none[1]
    assert enc[0] >= 5 and enc[1] >= 3


def test_bpe_merges_face_schema(spark, documents):
    rows = bpe_merges(documents, n_merges=5).collect()
    assert rows and [r["rank"] for r in rows] == list(range(len(rows)))
    for r in rows:
        assert r["merged"] == r["left"] + r["right"] and r["pair_freq"] >= 2


def test_bpe_oracle_sql_matches_reference_and_trainer(spark):
    """The unrolled DuckDB oracle (bpe_merges_oracle_sql) reproduces both
    the in-memory reference and the distributed trainer exactly — the
    merge-overlap edge cases ('aaa' under (a,a); re-mergeable chains) are
    planted in the fixture so the wrapped-string replace() semantics are
    exercised, not just the easy path."""
    import duckdb

    from baum_welch_spark.operators.bpe import bpe_merges_oracle_sql

    texts = [
        (0, "aaa aaa aaaa low low lower lowest newest newest west west west"),
        (1, "abab abab ab aaa low newest west wider wider"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    freqs = Counter(w for _, t in texts for w in t.lower().split())
    want = _reference_bpe(freqs, 10)
    got_trainer = bpe_train(df, n_merges=10)
    assert got_trainer == want, (got_trainer, want)

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    orc = con.execute(bpe_merges_oracle_sql(10)).fetchall()
    got_oracle = [(l, r, f) for _, l, r, _, f in orc]
    assert got_oracle == want, (got_oracle, want)
