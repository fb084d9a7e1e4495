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

Iterative training is not SQL-expressible: the driver faces are rows-only,
and correctness is pinned against a reference in-memory BPE implementation
(exact merge-sequence equality) in tests.
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
    vocab = (
        word_vocab(documents)
        .select(F.concat(chars, F.array(F.lit(EOW))).alias("syms"), "freq")
        .localCheckpoint(eager=True)
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
        ).localCheckpoint(eager=True)
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
