"""Dedup family at 16x corpus stress (round 4, VERDICT r3 item 4).

16 offset copies of the sf0.1 documents table (80,000 docs) — replication
is exactly the duplication structure a production dedup hunts, so every
base document gains 15 exact near-dup copies and the minhash pair graph
grows dense clusters. Pipeline measured end-to-end:

  minhash signatures -> LSH band pairs -> connected components -> keepers

  python3 scripts/dedup_scale_bench.py [cpus] [mult]

Prints one JSON line: exact output counts (pairs / clusters / keepers),
CC round count, wall seconds, rows/s. Counts are deterministic — two legs
must reproduce them exactly.
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

    from geojson_vt_cpp_spark.operators.dedup import (
        dedup_clusters, minhash_near_dup_pairs,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"dedup-scale-{mult}x")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = base.count()
    docs = (
        base.crossJoin(spark.range(mult).select(F.col("id").alias("copy")))
        .select(
            (F.col("doc_id") + F.col("copy") * n_base).alias("doc_id"),
            "text", "lang",
        )
        .repartition(cpus * 2)
        .cache()
    )
    n_docs = docs.count()

    t0 = time.time()
    pairs = minhash_near_dup_pairs(docs).cache()
    n_pairs = pairs.count()
    t_pairs = time.time() - t0

    stats: dict = {}
    t1 = time.time()
    clusters = dedup_clusters(pairs, docs, stats_out=stats, max_iters=20)
    agg = clusters.agg(
        F.count("*").alias("rows"),
        F.countDistinct("cluster_id").alias("n_clusters"),
        F.sum("is_keeper").alias("n_keepers"),
        F.max("cluster_size").alias("max_cluster"),
    ).first()
    t_cc = time.time() - t1

    total = round(time.time() - t0, 1)
    out = {
        "mult": mult,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_pairs": n_pairs,
        "pairs_sec": round(t_pairs, 1),
        "cc_rounds": stats.get("rounds"),
        "cluster_rows": agg["rows"],
        "n_clusters": agg["n_clusters"],
        "n_keepers": agg["n_keepers"],
        "max_cluster": agg["max_cluster"],
        "cc_sec": round(t_cc, 1),
        "total_sec": total,
        "rows_per_sec": round((n_pairs + agg["rows"]) / total, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
