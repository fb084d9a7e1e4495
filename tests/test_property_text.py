"""Property-based robustness tests: text operators vs straight-line Python
references on hypothesis-generated corpora (odd whitespace, repeated lines,
unicode) — the edge cases the synthetic driver corpus never produces.

Pattern: collect generated cases into one corpus, run ONE Spark job, check
row-by-row against the Python reference (same as the portable-hash test)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abwxyz01 .\n", min_size=0, max_size=60)


def _gen_texts(n=25):
    cases = ["", " ", "\n", "a\na\na", "x y\nx y", "dup\ndup\nuniq"]

    @settings(max_examples=n, deadline=None)
    @given(_WORD)
    def collect(s):
        cases.append(s)

    collect()
    return cases


def test_line_dedup_matches_python_reference(spark):
    from baum_welch_spark.operators.quality import line_dedup

    texts = _gen_texts()
    docs = [(i, t) for i, t in enumerate(texts)]
    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in line_dedup(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    # reference: first occurrence of each line across (doc_id, pos) order
    seen: dict[str, tuple] = {}
    for doc_id, t in docs:
        for pos, line in enumerate(t.split("\n")):
            if line not in seen:
                seen[line] = (doc_id, pos)
    for doc_id, t in docs:
        lines = t.split("\n")
        kept = [l for p, l in enumerate(lines) if seen[l] == (doc_id, p)]
        assert out[doc_id] == (len(lines), len(kept), "\n".join(kept)), (doc_id, t)


def test_pii_redact_matches_python_reference(spark):
    from baum_welch_spark.operators.quality import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_redact,
    )

    base = _gen_texts(10)
    planted = [
        "mail me at bob.smith+x@example.com or 555.123.4567",
        "server 10.0.0.1 and 192.168.255.255 up",
        "555-123-4567@example.com embeds digits",
        "ip 1.2.3.4. trailing dot",
    ]
    texts = base + planted
    docs = [(i, t) for i, t in enumerate(texts)]
    out = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_ips"], r["clean_text"])
        for r in pii_redact(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for doc_id, t in docs:
        red1 = re.sub(EMAIL_RE, "<EMAIL>", t)
        red2 = re.sub(PHONE_RE, "<PHONE>", red1)
        red3 = re.sub(IPV4_RE, "<IP>", red2)
        expect = (
            len(re.findall(EMAIL_RE, t)),
            len(re.findall(PHONE_RE, red1)),
            len(re.findall(IPV4_RE, red2)),
            red3,
        )
        assert out[doc_id] == expect, (doc_id, t, out[doc_id], expect)


def test_token_stats_matches_python_reference(spark):
    from baum_welch_spark.operators.text import token_stats

    texts = _gen_texts()
    docs = [(i, t) for i, t in enumerate(texts)]
    rows = {
        r["doc_id"]: r
        for r in token_stats(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    for doc_id, t in docs:
        toks = t.lower().split(" ")
        r = rows[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct"] == len(set(toks))


def test_winnowing_guarantee_shared_substring(spark):
    # Winnowing's core guarantee (Schleimer et al. 2003): two documents
    # sharing a substring of length >= k + w - 1 share at least one
    # fingerprint. Plant a long shared span into otherwise-different docs.
    from baum_welch_spark.operators.text import copy_pairs, winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma " + shared + " delta epsilon"),
            (2, "one two three four " + shared + " five six"),
            (3, "completely unrelated content with nothing in common xyzw qqq"),
        ],
        schema="doc_id bigint, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared span must produce a shared fingerprint"
    pairs = {(r.doc_a, r.doc_b): r.shared for r in copy_pairs(docs, k=8, w=4, min_shared=2, max_df=10).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_density_below_full_shingling(spark):
    # winnowing keeps ~1/w of the gram hashes — assert it is materially
    # sparser than the full k-gram set on real documents
    from baum_welch_spark.operators.text import winnow_fingerprints
    from baum_welch_spark.sources.io import load_table
    from conftest import SF0001

    docs = load_table(spark, SF0001, "documents")
    n_fp = winnow_fingerprints(docs, k=8, w=4).count()
    total_grams = docs.selectExpr("sum(length(text) - 8 + 1) AS g").first().g
    assert n_fp < total_grams / 2


def test_copy_spans_localizes_planted_copy(spark):
    """A paragraph planted in two otherwise-different documents must yield
    a span covering (most of) the copy in doc_a, and unrelated docs none."""
    from baum_welch_spark.operators.text import copy_spans

    copy = "the quick brown fox jumps over the lazy dog again and again today"
    a_pre = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    b_pre = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec "
    docs = spark.createDataFrame(
        [
            (1, a_pre + copy),
            (2, b_pre + copy),
            (3, "completely unrelated text with nothing shared at all here ok"),
            (4, "another disjoint document whose words never overlap anything"),
        ],
        "doc_id bigint, text string",
    )
    spans = copy_spans(docs, min_shared=4).collect()
    assert spans, "planted copy not detected"
    pairs = {(r.doc_a, r.doc_b) for r in spans}
    assert pairs == {(1, 2)}  # only the planted pair, never 3/4
    # the copy starts at len(a_pre) + 1 (1-based) in doc 1; the merged span
    # must sit inside the copied region (winnowing guarantees coverage of
    # any shared run >= k + w - 1 = 11 chars, up to gap-merge slack)
    start = len(a_pre) + 1
    end = start + len(copy) - 1
    best = max(spans, key=lambda r: r.n_fps)
    assert start - 16 <= best.span_start <= end
    assert start <= best.span_end <= end + 16
    assert all(r.span_end >= r.span_start for r in spans)


def test_decontaminate_spans_localizes_planted_leak(spark):
    """A paragraph copied from an eval doc (doc_id % 50 == 0) into a
    training doc must produce a span inside the copied region; clean
    training docs produce nothing."""
    from baum_welch_spark.operators.text import decontaminate_spans

    leak = "exact benchmark question text that leaked into the training corpus verbatim"
    docs = spark.createDataFrame(
        [
            (50, "eval document preamble " + leak + " eval document epilogue"),
            (7, "training prefix words here " + leak + " training suffix words"),
            (8, "zq wq xq yq kq jq hq gq fq dq sq aq pq oq nq mq lq bq cq rq"),
        ],
        "doc_id bigint, text string",
    )
    spans = decontaminate_spans(docs, eval_mod=50).collect()
    assert spans and {r.doc_id for r in spans} == {7}
    start = len("training prefix words here ") + 1
    end = start + len(leak) - 1
    best = max(spans, key=lambda r: r.n_fps)
    assert start - 16 <= best.span_start <= end
    assert start <= best.span_end <= end + 16
