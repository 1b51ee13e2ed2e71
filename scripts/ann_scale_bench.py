"""Embedding/ANN family at 16x corpus stress (round 4).

16 deterministic variants of the sf0.1 embeddings table (16,000 vectors,
64-dim: each copy perturbs one coordinate as a pure function of copy
index, so vectors are distinct but the corpus stays synthetic), measured:

  IVF index build (k-means assign, 2 iters) -> probe search top-10
  + brute-force exact top-10 (the recall oracle)

  python3 scripts/ann_scale_bench.py [cpus] [mult]

Prints one JSON line: timings, recall@10 of the n_probe=4 search vs the
exact scan, and deterministic counts (two legs must reproduce them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geojson_vt_cpp_spark.operators.similarity import (
        ivf_index,
        ivf_search,
        ivf_search_batch,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ann-scale-{mult}x")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = base.count()
    embs = (
        base.crossJoin(spark.range(mult).select(F.col("id").alias("copy")))
        .select(
            (F.col("vec_id") + F.col("copy") * n_base).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> case when i = cast(copy % 64 as int) "
                "then cast(x + (copy + 1) * 0.01 as float) else x end)"
            ).alias("embedding"),
        )
        .repartition(cpus * 2)
        .cache()
    )
    n_vecs = embs.count()
    qvec = [float(v) for v in base.where("vec_id = 0").first()["embedding"]]

    t0 = time.time()
    assignments, centroids = ivf_index(embs, n_centroids=16, iters=2)
    assignments = assignments.cache()
    n_assigned = assignments.count()
    t_index = round(time.time() - t0, 1)

    t0 = time.time()
    approx = [r["vec_id"] for r in ivf_search(assignments, centroids, qvec, k=10, n_probe=4).collect()]
    t_search = round(time.time() - t0, 1)

    t0 = time.time()
    d2 = "aggregate(zip_with(embedding, qv, (a, b) -> (a - b) * (a - b)), cast(0.0 as double), (s, x) -> s + x)"
    exact = [
        r["vec_id"]
        for r in embs.withColumn("qv", F.expr(
            "array(" + ",".join(f"cast({v!r} as float)" for v in qvec) + ")"
        ))
        .select("vec_id", F.expr(d2).alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    t_exact = round(time.time() - t0, 1)

    # batched multi-query search: 16 queries in ONE job, per-query recall
    # vs a batched exact scan (window top-10 per query)
    from pyspark.sql.window import Window

    qdf = base.where("vec_id < 16").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t0 = time.time()
    got_batch = ivf_search_batch(
        assignments, centroids, qdf, k=10, n_probe=4
    ).collect()
    t_batch = round(time.time() - t0, 1)
    approx_by_q: dict = {}
    for r in got_batch:
        approx_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])

    t0 = time.time()
    bd2 = (
        "aggregate(zip_with(embedding, query_vec, (a, b) -> "
        "(cast(a as double) - cast(b as double)) * (cast(a as double) - cast(b as double))), "
        "cast(0.0 as double), (s, x) -> s + x)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact_rows = (
        embs.crossJoin(F.broadcast(qdf))
        .select("query_id", "vec_id", F.expr(bd2).alias("d2"))
        .withColumn("rn", F.row_number().over(wq))
        .where("rn <= 10")
        .collect()
    )
    t_exact_batch = round(time.time() - t0, 1)
    exact_by_q: dict = {}
    for r in exact_rows:
        exact_by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    batch_recalls = [
        len(approx_by_q.get(q, set()) & exact_by_q[q]) / 10.0 for q in exact_by_q
    ]

    out = {
        "mult": mult,
        "cpus": cpus,
        "n_vectors": n_vecs,
        "index_sec": t_index,
        "search_sec": t_search,
        "exact_scan_sec": t_exact,
        "n_assigned": n_assigned,
        "recall_at_10": round(len(set(approx) & set(exact)) / 10.0, 2),
        "approx_ids": sorted(approx),
        "exact_ids": sorted(exact),
        "batch_queries": len(exact_by_q),
        "batch_search_sec": t_batch,
        "batch_exact_sec": t_exact_batch,
        "batch_mean_recall_at_10": round(sum(batch_recalls) / len(batch_recalls), 3),
        "batch_min_recall_at_10": round(min(batch_recalls), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
