"""MVT export throughput + two-size scaling for tiles_to_mvt.

Measures the round-5 tile sink on the bench corpus pyramid (us-states mix,
SPARK_GRAFT_COPIES_MULT controls size): build the pyramid once per leg,
then time tiles_to_mvt end-to-end (shuffle + encode + blob materialize via
count over n_bytes sum). Encode is embarrassingly parallel after its one
co-locating shuffle, so the two-size efficiency here isolates the operator
from the pyramid's BFS floor.

Run:  python3 scripts/mvt_export_bench.py [cpus ...]
      (default legs: 2 8 — each leg runs in its OWN subprocess per the
      BENCH.md methodology: the py4j JVM gateway outlives spark.stop(),
      so in-process sequential legs would share JIT state and bias the
      later leg)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cpus: int, mult: int, sf_dir: str) -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from geojson_vt_cpp_spark.config import Options
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.operators.tile_export import tiles_to_mvt
    from geojson_vt_cpp_spark.sources.documents import (
        documents_from_fixture, replicate_documents,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    try:
        base = documents_from_fixture(spark, E._fixture_text(), "us-states")
        docs = replicate_documents(base, max(2, 200 * mult)).repartition(
            cpus * 2
        ).cache()
        docs.count()
        pyr = TilePyramid.from_documents(
            docs, Options(index_max_zoom=5, index_max_points=50_000, max_zoom=14)
        )
        tf = pyr.tile_features()
        tf.count()  # materialize the pyramid outside the timed window
        # untimed warm-up of the export path (JIT/runner startup)
        chunk_rows = int(os.environ.get("SPARK_GRAFT_MVT_CHUNK_ROWS", "0")) or None
        tiles_to_mvt(tf.limit(2000), chunk_rows=chunk_rows).count()
        t0 = time.time()
        agg = tiles_to_mvt(tf, chunk_rows=chunk_rows).agg(
            F.count("*").alias("tiles"),
            F.sum("n_features").alias("features"),
            F.sum("n_bytes").cast("long").alias("bytes"),
        ).collect()[0]
        dt = time.time() - t0
        out = {
            "cpus": cpus,
            "mult": mult,
            "sec": round(dt, 3),
            "tiles": agg["tiles"],
            "features": agg["features"],
            "mvt_mb": round((agg["bytes"] or 0) / 1e6, 1),
            "features_per_sec": round((agg["features"] or 0) / dt, 1),
            "loadavg_1m": round(os.getloadavg()[0], 1),
            "chunk_rows": chunk_rows,
        }
        pyr.close()
        docs.unpersist()
        return out
    finally:
        spark.stop()


def _run_leg_subprocess(cpus: int, mult: int, sf_dir: str) -> dict:
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_COPIES_MULT"] = str(mult)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", str(cpus)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"leg local[{cpus}] failed (rc={out.returncode}): "
            f"{out.stderr.strip()[-2000:]}"
        )
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("SPARK_GRAFT_COPIES_MULT", "1"))
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        print(json.dumps(run_leg(int(sys.argv[2]), mult, sf_dir)))
        return
    cpu_legs = [int(a) for a in sys.argv[1:]] or [2, 8]
    legs = [_run_leg_subprocess(c, mult, sf_dir) for c in cpu_legs]
    out: dict = {"mode": "mvt-export", "legs": legs}
    by = {}
    for leg in legs:
        by.setdefault(leg["cpus"], []).append(leg["features_per_sec"])
    lo, hi = min(by), max(by)
    if lo != hi:
        b_lo, b_hi = max(by[lo]), max(by[hi])
        out["efficiency"] = round((b_hi / b_lo) / (hi / lo), 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_history.jsonl"), "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
