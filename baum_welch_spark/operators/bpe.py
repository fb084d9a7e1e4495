"""Distributed BPE tokenizer training — the vocabulary-learning step of an
LLM data pipeline (train byte-pair merges on the corpus, then tokenize with
them). Classic greedy BPE (Sennrich et al. 2016): repeatedly merge the most
frequent adjacent symbol pair.

Scale posture (100 TB corpus):

- The corpus is touched ONCE: a combinable word-count groupBy reduces it to
  the distinct-word vocabulary ``(word, freq)``. Every training iteration
  after that operates on the vocab table — typically 10^6-10^7 rows no
  matter how large the corpus — so 100 TB of text costs the same training
  loop as 100 GB plus one word-count shuffle.
- Each iteration: pair counting is explode + combinable weighted sum
  (|distinct pairs| rows shuffled); the argmax is a 1-row
  TakeOrderedAndProject; the merge rewrite is a pure Catalyst array fold
  (no UDF). Vocab state is localCheckpoint'ed per iteration (lineage
  truncation — see bpe_train); superseded checkpoints are freed by the
  ContextCleaner as their references drop.
- Encoding (``bpe_encode``) applies the learned ranks in an Arrow-batched
  kernel over documents — embarrassingly parallel, merges broadcast.

Correctness: greedy BPE is ALL integer counts and deterministic string
tie-breaks — no floats — so the distributed trainer is pinned DuckDB-exact
(not just reference-implementation-pinned): :func:`bpe_merges_oracle_sql`
unrolls the fixed merge rounds as chained CTEs (the kmeans_parity /
pagerank_docs_sql fixed-iteration pattern) and must reproduce the trainer's
merge table bit-for-bit. A reference in-memory BPE implementation
additionally pins both in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (GPT-2 style boundary symbol, appended to each word)
EOW = "▁"


def _words(col: str = "text"):
    from baum_welch_spark.functions.columns import words

    return words(col)


def word_vocab(documents: DataFrame) -> DataFrame:
    """Corpus -> (word, freq): the single corpus-sized reduction."""
    return (
        documents.select(F.explode(_words()).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_adjacent(syms: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs via
    a Catalyst array fold — no UDF. ``aaa`` under merge (a,a) becomes
    (aa, a), matching reference BPE's leftmost-first behavior."""
    l, r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(documents: DataFrame, n_merges: int = 30) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns [(left, right, pair_freq)] in
    merge order. Ties break on (freq desc, left asc, right asc) so the
    sequence is deterministic across engines and partitionings."""
    chars = F.expr("split(word, '')")
    # localCheckpoint (not persist): each iteration's merge rewrite nests
    # another array-fold lambda into the lineage, and 20+ nested folds make
    # the logical plan string itself blow the JVM heap when AQE renders it.
    # Checkpointing truncates the lineage to the materialized partitions, so
    # every iteration starts from a flat plan.
    # eager=False (r14 optimization round, guide §1.4/§3.3): the checkpoint
    # then materializes INSIDE the next pair-count job instead of as its own
    # job — one pass over the vocab table per iteration instead of two
    # (rewrite job + count job), and the final iteration's rewrite (whose
    # vocab nobody reads) never runs at all: 2N+1 jobs -> N for N merges.
    vocab = (
        word_vocab(documents)
        .select(F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "freq")
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("f"))
            .orderBy(F.desc("f"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["f"] < 2:
            break
        l, r, f = top[0]["l"], top[0]["r"], int(top[0]["f"])
        merges.append((l, r, f))
        new_vocab = vocab.select(
            _merge_adjacent(F.col("syms"), l, r).alias("syms"), "freq"
        ).localCheckpoint(eager=False)
        # checkpoint blocks are freed by the ContextCleaner once the previous
        # DataFrame's RDD is unreferenced — dropping our reference here is
        # the cleanup (unpersist() does not remove checkpoint blocks)
        vocab = new_vocab
    return merges


def bpe_merges(documents: DataFrame, n_merges: int = 30) -> DataFrame:
    """Driver-contract face: the learned merge table
    (rank, left, right, merged, pair_freq)."""
    spark = documents.sparkSession
    rows = [
        (i, l, r, l + r, f) for i, (l, r, f) in enumerate(bpe_train(documents, n_merges))
    ]
    return spark.createDataFrame(
        rows, "rank long, left string, right string, merged string, pair_freq long"
    ).orderBy("rank")


#: separator for the oracle's wrapped-symbol string encoding — U+001F (unit
#: separator), absent from the corpus (word_vocab text is space-tokenized
#: prose; a corpus containing \x1f or the EOW marker would break BOTH the
#: trainer and the oracle identically, so the assumption is shared).
SEP = "\x1f"


def bpe_merges_oracle_sql(n_merges: int = 30) -> str:
    """DuckDB oracle for :func:`bpe_merges` — the greedy trainer unrolled
    as ``n_merges`` chained CTE rounds (the clustering.kmeans_parity_sql /
    graph.pagerank_docs_sql fixed-iteration pattern), pinning the REAL
    distributed trainer (not a twin) hash-exact: every quantity is integer
    or string, so there is no cross-engine float surface at all.

    Vocabulary state is a separator-wrapped symbol string: symbols
    ``[a, b]`` encode as ``\\x1fa\\x1f\\x1fb\\x1f`` (each symbol wrapped in
    U+001F on both sides). Under that encoding the greedy leftmost
    non-overlapping merge of adjacent pair (l, r) is EXACTLY SQL
    ``replace(w, SEP||l||SEP||SEP||r||SEP, SEP||l||r||SEP)``:

    - non-overlapping left-to-right replace = the _merge_adjacent fold
      (``aaa`` under (a,a) -> ``aa,a``: the second candidate's leading
      separator is consumed by the first match, exactly as the fold's
      accumulator head is the merged symbol, never the bare left);
    - a merged symbol can never re-match as the LEFT of the same pair in
      one pass (that would need merged == l, i.e. r empty) nor as the
      RIGHT (l empty), matching the fold's single-pass semantics;
    - separators align only on symbol boundaries (symbols cannot contain
      SEP), so no cross-symbol false matches.

    Each round: split the wrapped string back to a symbol list, count
    adjacent pairs weighted by word freq (lateral generate_series — the
    zip_with slice pair explode), pick the (freq DESC, l ASC, r ASC)
    argmax via ROW_NUMBER (binary string order on both engines; corpus is
    lowercased), stop when the best pair's freq < 2 (empty CTE cascades,
    mirroring the trainer's break). Counts cast ::BIGINT so DuckDB's
    HUGEINT sum arrives with the trainer's int64 dtype kind."""
    ctes = [
        f"""wv AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) tok
  WHERE length(word) > 0
  GROUP BY word
),
v0 AS MATERIALIZED (
  -- '([\\s\\S])' not '(.)': RE2's dot excludes \\n, while the trainer's
  -- per-char split wraps EVERY character — a newline inside a word (the
  -- tokenizer splits on single spaces only) must wrap identically in
  -- both dialects (ADVICE r13; latent only, current testdata has none)
  SELECT regexp_replace(word || '{EOW}', '([\\s\\S])', '{SEP}\\1{SEP}', 'g') AS w, freq
  FROM wv
)"""
    ]
    for t in range(1, n_merges + 1):
        p = t - 1
        ctes.append(f"""p{t} AS MATERIALIZED (
  SELECT s[i] AS l, s[i + 1] AS r, freq
  FROM (
    SELECT string_split(substring(w, 2, length(w) - 2), '{SEP}{SEP}') AS s, freq
    FROM v{p}
  ) syms, UNNEST(generate_series(1, len(s) - 1)) AS g(i)
)""")
        ctes.append(f"""t{t} AS MATERIALIZED (
  SELECT l, r, f FROM (
    SELECT l, r, f, ROW_NUMBER() OVER (ORDER BY f DESC, l ASC, r ASC) AS rn
    FROM (SELECT l, r, sum(freq)::BIGINT AS f FROM p{t} GROUP BY l, r) cnt
  ) rk
  WHERE rn = 1 AND f >= 2
)""")
        ctes.append(f"""v{t} AS MATERIALIZED (
  SELECT replace(v.w, '{SEP}' || t.l || '{SEP}{SEP}' || t.r || '{SEP}',
                 '{SEP}' || t.l || t.r || '{SEP}') AS w, v.freq
  FROM v{p} v CROSS JOIN t{t} t
)""")
    unrolled = ",\n".join(ctes)
    union = "\nUNION ALL\n".join(
        f'SELECT {t - 1}::BIGINT AS "rank", l AS "left", r AS "right",'
        f" l || r AS merged, f AS pair_freq FROM t{t}"
        for t in range(1, n_merges + 1)
    )
    return f'WITH {unrolled}\nSELECT * FROM (\n{union}\n) mrg ORDER BY "rank"\n'


def bpe_encode(documents: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize with learned merges: Arrow-batched kernel, merges broadcast
    as a rank map (apply lowest-rank mergeable pair first — the standard
    BPE encoder). Output: (doc_id, n_tokens, n_chars) per doc."""
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best, bi = None, -1
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if best is None:
                break
            syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
        return len(syms)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # split(" ") — the SAME tokenizer word_vocab trains on; str.split()
            # (any whitespace) would tokenize inconsistently with the learned
            # merges for text containing newlines/tabs
            n_tokens = [
                sum(encode_word(w) for w in t.lower().split(" ") if w)
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "n_chars": pdf["text"].str.len().astype("int64"),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, n_tokens long, n_chars long"
    )
