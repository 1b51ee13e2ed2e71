"""Hot-component connected-components workload (BENCH.md skew evidence).

One giant near-dup cluster: a 1M-spoke STAR on hub node 0 (every symmetric
edge (spoke -> 0) lands on the SAME join key — the worst-case hot key for
the per-round message join) with a 10-node chain hanging off the hub (so
min-label propagation needs ~12 rounds, not 2), plus 100k disjoint pairs as
background. Verifies:

- round count stays O(diameter) (chain length + confirm round),
- the hot key does not blow up a reducer: the message join's skew is
  AQE-split and the groupBy(id).agg(min) fan-in to the hub is absorbed by
  map-side partial aggregation,
- component labels are exact (giant size, pair count, hub label).

  python3 scripts/cc_hot_component_bench.py [cpus] [--tableio]

--tableio additionally runs the manifest-gated TableIO checkpoint path in
a temp workdir (cluster-scale variant) and reports its time.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SPOKES = 1_000_000
CHAIN = 10
N_PAIRS = 100_000


def build_edges(spark):
    # star: (i, 0) for i in 1..N_SPOKES; chain off the hub:
    # (S+1, 0), (S+2, S+1), ...; background pairs (B+2k, B+2k+1)
    spokes = spark.range(1, N_SPOKES + 1).selectExpr("id as src", "cast(0 as long) as dst")
    base = N_SPOKES + 1
    chain = spark.range(CHAIN).selectExpr(
        f"id + {base} as src",
        f"case when id = 0 then cast(0 as long) else id + {base} - 1 end as dst",
    )
    pbase = base + CHAIN
    pairs = spark.range(N_PAIRS).selectExpr(
        f"{pbase} + 2 * id as src", f"{pbase} + 2 * id + 1 as dst"
    )
    edges = spokes.unionByName(chain).unionByName(pairs)
    nodes = edges.selectExpr("src as id").unionByName(edges.selectExpr("dst as id")).distinct()
    return edges.localCheckpoint(), nodes.localCheckpoint()


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8
    use_tableio = "--tableio" in sys.argv
    from pyspark.sql import SparkSession

    from geojson_vt_cpp_spark.operators.dedup import connected_components

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "10g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges, nodes = build_edges(spark)
    n_nodes, n_edges = nodes.count(), edges.count()

    stats: dict = {}
    t0 = time.time()
    comp = connected_components(edges, nodes, max_iters=20, stats_out=stats)
    sizes = {r["comp"]: r["n"] for r in
             comp.groupBy("comp").count().withColumnRenamed("count", "n")
             .orderBy("n", ascending=False).limit(3).collect()}
    dt = time.time() - t0
    giant = sizes.get(0, 0)
    out = {
        "bench": "cc_hot_component", "cpus": cpus,
        "n_nodes": n_nodes, "n_edges": n_edges,
        "rounds": stats.get("rounds"), "sec": round(dt, 2),
        "giant_size": giant,
        "giant_exact": giant == N_SPOKES + CHAIN + 1,
        "loadavg": round(os.getloadavg()[0], 1),
    }
    if use_tableio:
        from geojson_vt_cpp_spark.sources.table_io import TableIO

        wd = tempfile.mkdtemp(prefix="cc_bench_")
        t1 = time.time()
        comp2 = connected_components(
            edges, nodes, max_iters=20, table_io=TableIO(spark, wd)
        )
        g2 = comp2.where("comp = 0").count()
        out["tableio_sec"] = round(time.time() - t1, 2)
        out["tableio_giant_exact"] = g2 == N_SPOKES + CHAIN + 1
        shutil.rmtree(wd, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
