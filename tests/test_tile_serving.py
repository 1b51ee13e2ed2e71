"""Warm tile serving: ``enable_serving`` exports a pk-sorted parquet
snapshot; subsequent ``get_tile`` hits answer from a driver-local pyarrow
probe — byte-identical tiles, NO Spark job (the reference's warm hash-map
probe, geojsonvt.hpp:117-128, re-expressed as a read-through snapshot)."""

from __future__ import annotations

import pytest

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark


def _tile_dict(t):
    return {
        "z": t.z, "x": t.x, "y": t.y, "features": t.features,
        "num_points": t.num_points, "num_simplified": t.num_simplified,
    }


def test_serving_equals_spark_path(spark, tmp_path):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    # two pyramids over the same input: one serves from the snapshot, the
    # other collects through Spark — every materialized tile must match
    cold = TilePyramid.from_documents(docs, Options(index_max_zoom=3))
    warm = TilePyramid.from_documents(docs, Options(index_max_zoom=3))
    warm.enable_serving(str(tmp_path / "serve"))
    keys = sorted(warm.meta.keys())
    assert keys == sorted(cold.meta.keys())

    # the warm path must never submit a Spark job: poison the Spark fallback
    def _boom():
        raise AssertionError("warm get_tile touched the Spark path")

    warm.tile_features = _boom
    for (z, x, y) in keys:
        got = warm.get_tile(z, x, y)
        want = cold.get_tile(z, x, y)
        assert _tile_dict(got) == _tile_dict(want), (z, x, y)
    cold.close()
    warm.close()


def test_serving_covers_drilled_tiles_after_reexport(spark, tmp_path):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    pyr = TilePyramid.from_documents(docs, Options())
    # drill first, export after: the snapshot covers drilled tiles too
    drilled = pyr.get_tile(7, 37, 48)
    assert drilled.features
    total_after_drill = pyr.total
    pyr.enable_serving(str(tmp_path / "serve"))
    pyr._tile_cache.clear()
    pyr.tile_features = lambda: (_ for _ in ()).throw(AssertionError("spark"))
    again = pyr.get_tile(7, 37, 48)
    assert _tile_dict(again) == _tile_dict(drilled)
    # probe-only reads change no drill accounting
    assert pyr.total == total_after_drill


def test_serving_invalidated_by_drill(spark, tmp_path):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    pyr = TilePyramid.from_documents(docs, Options())
    pyr.enable_serving(str(tmp_path / "serve"))
    assert pyr._serving is not None
    # a miss-triggered drill creates tiles absent from the snapshot — it
    # must drop the snapshot, and the fresh tile must still come out right
    t = pyr.get_tile(7, 37, 48)
    assert pyr._serving is None
    assert t.features
    pyr.close()


def test_serving_empty_tile_probe(spark, tmp_path):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    # force splits so empty quadrants materialize (every split registers
    # all four children, geojsonvt.hpp:189-206 — us-states covers only a
    # fraction of the world so shallow quadrants go empty)
    pyr = TilePyramid.from_documents(
        docs, Options(index_max_zoom=3, index_max_points=10)
    )
    pyr.enable_serving(str(tmp_path / "serve"))
    empty_keys = [k for k, m in pyr.meta.items() if m.rows == 0]
    assert empty_keys
    pyr.tile_features = lambda: (_ for _ in ()).throw(AssertionError("spark"))
    z, x, y = empty_keys[0]
    t = pyr.get_tile(z, x, y)
    assert t.features == [] and (t.z, t.x, t.y) == (z, x, y)
