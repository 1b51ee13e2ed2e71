"""Incremental append vs full rebuild at corpus scale (round 4).

Builds the bench pyramid over N us-states copies, appends N_APPEND more
copies incrementally, and times the same end state built from scratch —
the quantitative case for TilePyramid.append: the incremental path
re-clips only the appended features' tile cover, while the rebuild
re-clips everything.

  python3 scripts/append_scale_bench.py [cpus] [base_copies] [extra_copies]

Prints one JSON line with both times and the (identical) registry/tile
counts; correctness of append ≡ rebuild is pytest-gated separately
(tests/test_pyramid_append.py) — this script measures, then cross-checks
counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    base_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    extra_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("append-scale-bench")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    from geojson_vt_cpp_spark.config import Options
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.sources.documents import (
        documents_from_fixture, replicate_documents,
    )

    opts = dict(index_max_zoom=5, index_max_points=50_000, max_zoom=14)
    base_docs = documents_from_fixture(spark, E._fixture_text(), "us-states")
    base = replicate_documents(base_docs, base_copies).repartition(cpus * 2).cache()
    extra = (
        replicate_documents(base_docs, extra_copies)
        .selectExpr(f"concat('x-', doc_id) as doc_id", "spans")
        .repartition(cpus).cache()
    )
    base.count(), extra.count()

    # warm-up (JIT/codegen, Python runners)
    wp = TilePyramid.from_documents(
        replicate_documents(base_docs, 2),
        Options(index_max_zoom=2, index_max_points=50_000, max_zoom=14),
    )
    wp.tile_features().count()
    wp.close()

    t0 = time.time()
    pyr = TilePyramid.from_documents(base, Options(**opts))
    n_base = pyr.tile_features().count()
    t_build = round(time.time() - t0, 2)

    t0 = time.time()
    pyr.append(docs_df=extra)
    n_inc = pyr.tile_features().count()
    t_append = round(time.time() - t0, 2)
    inc_total = pyr.total
    pyr.close()

    t0 = time.time()
    full = TilePyramid.from_documents(base.unionByName(extra), Options(**opts))
    n_full = full.tile_features().count()
    t_rebuild = round(time.time() - t0, 2)
    full_total = full.total
    full.close()

    out = {
        "cpus": cpus,
        "base_copies": base_copies,
        "extra_copies": extra_copies,
        "build_base_sec": t_build,
        "append_sec": t_append,
        "rebuild_union_sec": t_rebuild,
        "speedup_vs_rebuild": round(t_rebuild / t_append, 2) if t_append else None,
        "tiles_base": n_base,
        "tile_rows_incremental": n_inc,
        "tile_rows_rebuild": n_full,
        "registry_incremental": inc_total,
        "registry_rebuild": full_total,
        "counts_match": bool(n_inc == n_full and inc_total == full_total),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
