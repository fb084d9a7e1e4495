"""Per-stage timing breakdown for the IVF-PQ family (VERDICT-r14 #3):
replicates ivfpq_serve_face / knn_ivfpq / ivfpq_append_face stage by stage
with wall timers, so the round doc can say WHERE the 6-8 s goes (coarse
k-means iterations, PQ codebook iterations, encode+write, probe+rerank).
Read-only with respect to the faces: calls the same public functions with
the same parameters. Usage: python tools/ivfpq_stages.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from baum_welch_spark.operators import pq as pqm
    from baum_welch_spark.operators.clustering import kmeans_fit
    from baum_welch_spark.session import get_spark, scratch_dir
    from baum_welch_spark.sources.io import load_table

    spark = get_spark(app_name="ivfpq-stages")
    spark.sparkContext.setLogLevel("ERROR")
    embeddings = load_table(spark, args.sf, "embeddings")
    # warm (bench.py convention)
    embeddings.write.format("noop").mode("overwrite").save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    t: dict[str, float] = {}

    def clock(name: str, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 3)
        print(f"{name}: {t[name]:.3f}s", flush=True)
        return out

    # ---- ivfpq_serve_face decomposition (train on full corpus) ----
    src = pqm._normalized(embeddings).persist()
    clock("serve.materialize_normalized", lambda: src.count())
    centroids = clock(
        "serve.kmeans_fit(coarse,6it)",
        lambda: kmeans_fit(
            src.select("vec_id", F.col("nv").alias("embedding")),
            k=8, max_iter=6, seed=7,
        )[0],
    )
    res = pqm._residuals(src, centroids).persist()
    clock("serve.materialize_residuals", lambda: res.count())
    books = clock(
        "serve.train_books(pq,8it)",
        lambda: pqm._train_books(res.select("vec_id", "nv"), 8, 16, 8, 7, 1e-6),
    )
    res.unpersist()
    src.unpersist()
    path = scratch_dir("bw_ivfpq_stage_")
    clock(
        "serve.encode+write_codes",
        lambda: pqm.ivfpq_encode(embeddings, centroids, books)
        .write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes"),
    )
    # model-table writes are pyarrow-direct inside ivfpq_write_index; emulate
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq_file

    nc, d = centroids.shape
    ci, pi = np.meshgrid(np.arange(nc), np.arange(d), indexing="ij")
    os.makedirs(f"{path}/centroids", exist_ok=True)
    pq_file.write_table(
        pa.table({
            "cell": pa.array(ci.ravel(), type=pa.int32()),
            "pos": pa.array(pi.ravel(), type=pa.int32()),
            "val": pa.array(centroids.ravel(), type=pa.float64()),
        }),
        f"{path}/centroids/part-0.parquet",
    )
    mm, kk, dd = books.shape
    sj, sc_, sp = np.meshgrid(np.arange(mm), np.arange(kk), np.arange(dd), indexing="ij")
    os.makedirs(f"{path}/books", exist_ok=True)
    pq_file.write_table(
        pa.table({
            "subspace": pa.array(sj.ravel(), type=pa.int32()),
            "code": pa.array(sc_.ravel(), type=pa.int32()),
            "pos": pa.array(sp.ravel(), type=pa.int32()),
            "val": pa.array(books.ravel(), type=pa.float64()),
        }),
        f"{path}/books/part-0.parquet",
    )
    queries = embeddings.orderBy("vec_id").limit(5)
    out = clock(
        "serve.query(probe+rerank)",
        lambda: pqm.knn_ivfpq_query(spark, path, queries, embeddings, k=5, n_probe=3)
        .write.format("noop").mode("overwrite").save(),
    )

    # ---- knn_ivfpq (in-memory face) for comparison ----
    clock(
        "knn_ivfpq.full_face",
        lambda: pqm.knn_ivfpq(embeddings).write.format("noop").mode("overwrite").save(),
    )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(t, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
