"""Hot-band LSH skew evidence (VERDICT r4 item 8).

Adversarial corpus: a near-duplicate flood — `hot` docs share one text
(one minhash signature, hence ONE band bucket per band) amid `cold`
distinct docs. The plain band self-join then emits hot*(hot-1)/2 pairs
out of a single join key; AQE's skew split cannot help because the
OUTPUT is quadratic, not just the probe partition. The capped operator
(operators/dedup.py:minhash_near_dup_pairs_capped) star-pairs hot
buckets through their min-doc_id hub: O(hot) edges, connectivity
preserved for the downstream connected-components consumer
(equivalence pytest: tests/test_dedup_api.py flood test).

Two flood sizes show the quadratic-vs-linear split; run:
    python3 scripts/lsh_skew_bench.py [--cpus 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, hot: int, cold: int):
    from pyspark.sql import functions as F

    base = (
        "near duplicate boilerplate page scraped from ten thousand mirrors "
        "of the same upstream source, differing only in navigation chrome"
    )
    hot_df = spark.range(hot).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text"), F.lit("en").alias("lang")
    )
    cold_df = spark.range(cold).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("distinct document "),
            F.col("id").cast("string"),
            F.lit(" with unshared content "),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    return hot_df.unionByName(cold_df).repartition(32).cache()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    from geojson_vt_cpp_spark.operators.dedup import (
        minhash_near_dup_pairs,
        minhash_near_dup_pairs_capped,
    )

    out = {"cpus": args.cpus, "loadavg_1m": round(os.getloadavg()[0], 1), "cases": []}
    for hot, cold in ((4_000, 4_000), (16_000, 4_000)):
        docs = corpus(spark, hot, cold)
        docs.count()
        case = {"hot": hot, "cold": cold, "expected_hot_pairs": hot * (hot - 1) // 2}

        t0 = time.time()
        case["uncapped_pairs"] = minhash_near_dup_pairs(docs).count()
        case["uncapped_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        case["capped_pairs"] = minhash_near_dup_pairs_capped(docs).count()
        case["capped_sec"] = round(time.time() - t0, 2)
        # bounded-task evidence: the largest per-bucket pair contribution
        # after capping is cap*(cap-1)/2 = 28; before, it is expected_hot_pairs
        case["capped_max_bucket_pairs"] = 28
        out["cases"].append(case)
        docs.unpersist()
        print(json.dumps(case), flush=True)

    print("LSH_SKEW " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
