"""Quality operators: repetition stats, PII redaction, corpus-wide line
dedup — planted-fixture semantics plus scale-shape checks."""

import pytest
from pyspark.sql import functions as F

from baum_welch_spark.operators.quality import (
    line_dedup,
    pii_redact,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# -- repetition_stats --------------------------------------------------------


def test_repetition_stats_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "a b a b a b"),          # top bigram "a b" = 3 of 5
            (2, "x x x x y"),            # run of 4 x's
            (3, "one two three four"),   # no repetition
            (4, "solo"),                 # single token: no bigrams
        ],
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].n_tokens == 6
    assert got[1].top_bigram_frac == pytest.approx(3 / 5)
    assert not got[1].pass_repetition  # 0.6 > 0.18
    assert got[2].max_token_run == 4
    assert not got[2].pass_repetition  # run 4 > 3
    assert got[3].max_token_run == 1
    assert got[3].top_bigram_frac == pytest.approx(1 / 3)
    assert got[3].dup_trigram_frac == 0.0
    assert got[4].top_bigram_frac == 0.0
    assert got[4].dup_trigram_frac == 0.0
    assert got[4].max_token_run == 1


def test_repetition_dup_trigram_fraction(spark):
    # "a b c" occurs twice among 4 trigram instances -> dup fraction 0.5
    docs = _docs(spark, [(1, "a b c a b c")])
    row = repetition_stats(docs).collect()[0]
    assert row.dup_trigram_frac == pytest.approx(2 / 4)


# -- pii_redact --------------------------------------------------------------


def test_pii_redact_planted(spark):
    docs = _docs(
        spark,
        [
            (1, "mail bob@example.com or alice.smith@sub.domain.org now"),
            (2, "call +1-555-123-4567 x 555 123 4567"),
            (3, "host 192.168.0.1 and 10.0.0.255"),
            (4, "clean text with no pii"),
        ],
    )
    got = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert got[1].n_emails == 2 and "<EMAIL>" in got[1].clean_text
    assert "bob@example.com" not in got[1].clean_text
    # +1-555-123-4567: the pattern anchors on 3-3-4 digit groups
    assert got[2].n_phones == 2
    assert got[2].clean_text.count("<PHONE>") == 2
    assert got[3].n_ips == 2 and got[3].clean_text == "host <IP> and <IP>"
    assert got[4].clean_text == "clean text with no pii"
    assert got[4].n_emails == got[4].n_phones == got[4].n_ips == 0


def test_pii_email_redacted_before_phone_bites(spark):
    # digits inside an address must not be half-eaten by the phone pattern
    docs = _docs(spark, [(1, "reach 555.123.4567@example.com today")])
    row = pii_redact(docs).collect()[0]
    assert row.n_emails == 1
    assert row.clean_text == "reach <EMAIL> today"


# -- line_dedup --------------------------------------------------------------


def test_line_dedup_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha\nboilerplate\nbeta"),
            (2, "boilerplate\ngamma"),
            (3, "boilerplate"),
        ],
    )
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[1].clean_text == "alpha\nboilerplate\nbeta"  # first occurrence kept
    assert got[2].clean_text == "gamma"
    assert got[2].n_lines == 2 and got[2].n_kept == 1
    assert got[3].clean_text == "" and got[3].n_kept == 0  # fully deduped


def test_line_dedup_within_doc_repeats(spark):
    docs = _docs(spark, [(1, "x\nx\ny")])
    row = line_dedup(docs).collect()[0]
    assert row.clean_text == "x\ny"
    assert row.n_lines == 3 and row.n_kept == 2


def test_line_dedup_preserves_total_distinct_lines(spark, documents_sf0001):
    out = line_dedup(documents_sf0001)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    n_distinct = (
        documents_sf0001.select(F.explode(F.split("text", "\n")).alias("l"))
        .select("l")
        .distinct()
        .count()
    )
    assert total_kept == n_distinct


@pytest.fixture(scope="module")
def documents_sf0001(spark):
    from baum_welch_spark.sources.io import load_table

    from conftest import SF0001

    return load_table(spark, SF0001, "documents")


def test_compression_ratio_matches_zlib(spark):
    import zlib

    from conftest import SF0001

    from baum_welch_spark.operators.quality import compression_ratio
    from baum_welch_spark.sources.io import load_table

    docs = load_table(spark, SF0001, "documents")
    got = {r.doc_id: (r.n_bytes, r.ratio) for r in compression_ratio(docs).collect()}
    sample = docs.select("doc_id", "text").limit(30).collect()
    assert len(got) == docs.count()
    for r in sample:
        raw = (r.text or "").encode("utf-8")
        if raw:
            expect = round(len(zlib.compress(raw, 6)) / len(raw), 6)
            assert got[r.doc_id] == (len(raw), expect)
    # repetitive text compresses better than prose
    rep = spark.createDataFrame([(1, "spam " * 200), (2, None)], "doc_id long, text string")
    out = {r.doc_id: r.ratio for r in compression_ratio(rep).collect()}
    assert out[1] < 0.1 and out[2] is None
