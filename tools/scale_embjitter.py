"""Embedding near-dup plan-scaling measurement (SURVEY §8.3g addendum).

The 10x BOARD cannot measure the embedding near-dup operators' plan
scaling: at the faces' loose 0.35 threshold, pair OUTPUT is intrinsically
~n^2 (pair density ~1.5e-3 on the synthetic corpus), and plain replication
adds exact-clone pairs on top — wall tracks emitted pairs, not the plan.

This harness runs the operators at verify threshold 0.6 — where the base
corpus has ~1 true pair and the ``--jitter`` replica (tools/scale10x.py,
clone cosines pushed to ~0.5/~0.3) keeps the true set sparse and O(n) —
against sf0.1 and the jittered 10x replica. The measured ratio is then the
plan's data-linear term: normalize/sketch scan + bucket build + candidate
join + verify-of-few. Min-of-2 warm runs, noop-forced execution, same
protocol as tools/scale10x.py.

Usage:
  python tools/scale10x.py --jitter --rebuild   # build the replica first
  python tools/scale_embjitter.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from baum_welch_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
JIT = os.environ.get("SPARK_GRAFT_JIT_DIR", "/tmp/sf0.1_x10_jit")
THRESHOLD = 0.6


def main() -> int:
    from baum_welch_spark.operators.similarity import (
        cosine_neardup,
        cosine_neardup_lsh,
        semantic_dedup,
    )

    ops = {
        "cosine_neardup@0.6": lambda df: cosine_neardup(df, threshold=THRESHOLD),
        # bits=7 (128 buckets/table; 7x8=56 planes fits the 60-md5-bit budget):
        # the 4-bit face default is recall-tuned
        # for the loose 0.35 threshold and floods ~n^2/2 candidates past 1e4
        # vectors; at a tight threshold the per-workload tuning the docstring
        # prescribes is more bits — recall for a cos>=0.9 true pair is still
        # ~0.96 at (7 bits, 8 tables) while candidate mass drops ~8x/table
        "cosine_neardup_lsh@0.6": lambda df: cosine_neardup_lsh(
            df, threshold=THRESHOLD, bits=7
        ),
        "semantic_dedup@0.6": lambda df: semantic_dedup(df, threshold=THRESHOLD),
    }
    spark = get_spark(app_name="scale-embjitter")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM + Arrow workers (protocol: tools/scale10x.py)
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name, op in ops.items():
        times, rows = {}, {}
        for label, d in (("sf0.1", SRC), ("10x_jit", JIT)):
            emb = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                op(emb).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[label] = best
            rows[label] = op(emb).count()
        print(
            f"{name}: sf0.1 {times['sf0.1']:.1f}s/{rows['sf0.1']} rows  "
            f"10x_jit {times['10x_jit']:.1f}s/{rows['10x_jit']} rows  "
            f"wall ratio {times['10x_jit'] / times['sf0.1']:.1f}x"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
