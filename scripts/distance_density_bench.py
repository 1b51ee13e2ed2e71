"""distance_join resolution sizing on a hot (dense-site) grid.

Deterministic work metric: candidate pairs entering the exact distance
filter (cell-neighborhood join output). Wall time on this shared box is
noise-dominated; candidate count is the plan-shape quantity the res choice
controls, identical on every run.

Workload: 200k sites concentrated in a 0.05 x 0.05 patch, 20k queries in
the same patch, radius 0.01 — the hot-cell shape where the radius-anchored
res (cell ~ radius) packs tens of thousands of sites per cell.

  python3 scripts/distance_density_bench.py [cpus]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SITES = 200_000
N_QUERIES = 20_000
RADIUS = 0.01
PATCH = 0.05


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from geojson_vt_cpp_spark.operators.spatial_join import distance_join

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("distance-density-bench")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def patch_points(n, name, salt):
        return spark.range(n).select(
            F.col("id").alias(name),
            (F.lit(0.3) + ((F.col("id") * salt) % 99991) / 99991.0 * PATCH).alias(
                f"{name[0]}x"
            ),
            (F.lit(0.3) + ((F.col("id") * (salt + 2)) % 99989) / 99989.0 * PATCH).alias(
                f"{name[0]}y"
            ),
        )

    sites = patch_points(N_SITES, "site_id", 2654435761).cache()
    queries = patch_points(N_QUERIES, "query_id", 2246822519).cache()
    sites.count(), queries.count()

    r_res = int(math.floor(math.log2(1.0 / RADIUS)))  # radius-anchored
    out = {"n_sites": N_SITES, "n_queries": N_QUERIES, "radius": RADIUS}
    for label, res in (("radius_anchored", r_res), ("density_adaptive", None)):
        t0 = time.time()
        df = distance_join(
            queries, sites, RADIUS, res=res,
            query_cols=("query_id", "qx", "qy"), site_cols=("site_id", "sx", "sy"),
        )
        rows = df.count()
        out[label] = {
            "res": res if res is not None else "auto",
            "result_rows": rows,
            "sec": round(time.time() - t0, 2),
        }
    # candidate counts per res (the deterministic work metric): rebuild the
    # pre-filter join for each res explicitly
    for res in (r_res, r_res + 2):
        n = 1 << res
        ring = max(1, int(math.ceil(RADIUS * n)))
        qcell = queries.select(
            "query_id",
            F.floor(F.col("qx") * n).cast("long").alias("qix"),
            F.floor(F.col("qy") * n).cast("long").alias("qiy"),
        )
        nbr = qcell.withColumn(
            "ix", F.explode(F.sequence(F.col("qix") - ring, F.col("qix") + ring))
        ).withColumn(
            "iy", F.explode(F.sequence(F.col("qiy") - ring, F.col("qiy") + ring))
        )
        scell = sites.select(
            "site_id",
            F.floor(F.col("sx") * n).cast("long").alias("ix"),
            F.floor(F.col("sy") * n).cast("long").alias("iy"),
        )
        out[f"candidates_res{res}"] = nbr.join(scell, ["ix", "iy"]).count()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
