"""Per-face spot harness for the optimization rounds: time named
``queries()`` faces in isolation (noop sink, min of N — bench.py's
methodology) and/or dump their ``explain("formatted")`` plan to a file.

Timing and plan capture are the two primitives the optimization guide §1
asks for: isolate the computation from the sink, and keep the plan shape
(Exchange count, join strategy, PushedFilters, Python eval nodes) next to
the numbers. Plans land in ``plans/<tag>/<face>_<suffix>.txt``.

Usage:
  python tools/face_spot.py --runs 3 ewma_user_spend pagerank_docs
  python tools/face_spot.py --plan-dir plans/r14 --suffix before --runs 0 ewma_user_spend
  python tools/face_spot.py --sf /root/testdata/sf0.01 --runs 2 --plan-dir plans/r14 --suffix before bpe_merges
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2, help="0 = plan capture only")
    ap.add_argument("--plan-dir", help="dump explain('formatted') here")
    ap.add_argument("--suffix", default="before", help="plan filename suffix")
    ap.add_argument("--out", help="also write timings as JSON")
    ap.add_argument("faces", nargs="+")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from baum_welch_spark.session import drain_scratch, get_spark

    spark = get_spark(app_name="face-spot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    unknown = [f for f in args.faces if f not in qs]
    if unknown:
        raise SystemExit(f"unknown faces: {unknown}")

    # same warmup as bench.py so first-face numbers are plan costs, not JVM
    # / Arrow-worker spin-up
    if args.runs:
        qs["q1_pricing_summary"](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.range(32).repartition(32).mapInPandas(
            lambda it: it, schema="id long"
        ).write.format("noop").mode("overwrite").save()

    results: dict[str, dict] = {}
    for name in args.faces:
        spark.sparkContext.setJobDescription(f"face-spot: {name}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            path = os.path.join(args.plan_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"plan -> {path}", file=sys.stderr)
            drain_scratch()
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            drain_scratch()
        if times:
            results[name] = {"min": min(times), "runs": times}
            print(f"{name}: min {min(times)}s  runs {times}", flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.out and results:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
