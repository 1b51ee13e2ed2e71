"""Driver-meta scalability: big levels evaluate stop conditions
DataFrame-side and register into numpy blocks — identical decisions to the
small-level Python loop, bounded driver state at deep index_max_zoom."""

from __future__ import annotations

import resource

import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark


def test_big_level_path_matches_small_path(spark):
    """driver_stats_max=0 forces the DataFrame/numpy path at EVERY level;
    the resulting registry, per-zoom stats, tiles, and drill behavior must
    be identical to the default dict path on the us-states golden corpus."""
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    o = Options()
    small = TilePyramid.from_documents(docs, o)
    feats_tol = (o.tolerance / o.extent) / (1 << o.max_zoom)
    from geojson_vt_cpp_spark.operators.convert import extract_features

    big = TilePyramid(
        extract_features(docs, feats_tol, generate_id=o.generate_id),
        o,
        driver_stats_max=0,
    )
    assert big.meta._block_count > 0  # numpy blocks actually in use
    assert set(small.meta.keys()) == set(big.meta.keys())
    assert small.stats == big.stats
    for k, m in small.meta.items():
        bm = big.meta[k]
        assert (m.num_points, m.rows, m.has_source) == (
            bm.num_points, bm.rows, bm.has_source
        ), k
    assert small.all_tiles() == big.all_tiles()

    # drill-down over the block-backed registry: _MetaRef write-through
    t_small = small.get_tile(7, 37, 48)
    t_big = big.get_tile(7, 37, 48)
    assert t_big.features == t_small.features
    assert small.total == big.total  # identical drill accounting
    small.close()
    big.close()


def _synth_point_features(spark, n: int):
    """n spread unit-square point features in the engine's features-table
    encoding (pure column expressions — no external data)."""
    return spark.range(n).selectExpr(
        "cast(id as string) as doc_id",
        "0 as span_idx", "0 as feature_idx", "0 as member_seq",
        "1 as copy_tag", "'' as slice_path",
        "cast(id as string) as feature_id", "'u64' as id_kind",
        "'{}' as props_json",
        "1 as gtype",
        "array(((id * 2654435761) % 99991) / cast(99991 as double)) as xs",
        "array(((id * 2246822519) % 99989) / cast(99989 as double)) as ys",
        "array(0.0d) as zs",
        "array(1) as part_lens", "cast(array() as array<int>) as poly_lens",
        "array(0.0d) as part_meta", "array(0.0d) as seg_start",
        "array(0.0d) as seg_end",
        "xs[0] as minx", "ys[0] as miny", "xs[0] as maxx", "ys[0] as maxy",
        "1 as num_points",
    )


def test_index_max_zoom_9_build_bounded_driver(spark):
    """VERDICT r3 #5 'done' gate: an index_max_zoom=9 synthetic build
    (50k spread points, index_max_points=1 so splitting continues to the
    cap) completes with the visited-tile registry in numpy blocks, a small
    dict spillover, and bounded driver RSS growth."""
    feats = _synth_point_features(spark, 50_000)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024  # MB
    pyr = TilePyramid(
        feats,
        Options(index_max_zoom=9, index_max_points=1, max_zoom=14),
        pre_wrapped=True,
    )
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    # deep level registries are numpy blocks, not dict entries
    assert pyr.meta._block_count > 50_000, pyr.meta._block_count
    # only the shallow small levels (sum of 4^z for z<=6 = 5461) in the dict
    assert len(pyr.meta._extra) <= 5461
    assert pyr.total == sum(pyr.stats.values())
    assert pyr.total == pyr.meta._block_count + len(pyr.meta._extra)
    # every point lands in >= 1 leaf; spot-check one registry lookup path
    some_key = next(iter(pyr.meta.keys()))
    assert some_key in pyr.meta and pyr.meta[some_key].rows >= 0
    # high-water RSS growth stays far below what ~200k dict+_Meta entries
    # would cost; loose bound for the shared box
    assert rss1 - rss0 < 250, (rss0, rss1)
    pyr.close()
