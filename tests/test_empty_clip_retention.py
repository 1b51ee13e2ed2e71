"""Empty-clipped-feature retention parity (clip.hpp:297-312).

The reference keeps features whose non-trivial clip produced an EMPTY
geometry (they re-enter the clipped set with props/id and the inverted bbox
sentinel {{2,1},{-1,0}}, types.hpp:165). Such features are invisible in tile
OUTPUT, but they survive as source features, so a later drill-down below
them keeps registering (empty) child tiles in ``total``/``stats`` — where a
drop-at-clip engine would return the canonical empty tile unregistered.

Workload (hand-derived against geojsonvt.hpp:178-258 recursion, defaults
indexMaxZoom=5 / indexMaxPoints=100000 / buffer=64 / extent=4096, so
p = 0.5*64/4096 = 0.0078125):

  MultiPoint at unit-mercator (0.2, 0.2) and (0.2, ~0.5055).

- build: 2 points <= indexMaxPoints -> z0 retains source, total == 1.
- getTile(3, 0, 2) drills z0 -> z1 -> z2 -> z3:
  * z1 (0,0) trivially accepts both points (y-window [-0.0078, 0.5078]);
  * z2 (0,1) y-window [0.24609375, 0.50390625] overlaps the bbox
    [0.2, 0.5055] but contains NEITHER point -> non-trivial clip ->
    EMPTY multipoint retained;
  * the placeholder's sentinel bbox trivially accepts into all four z3
    children, so the drill registers them all.
  Reference counters: total == 1 + 4 + 4 + 4 = 13,
  stats == {0:1, 1:4, 2:4, 3:4}; the target tile exists with 0 features.

Asserted on BOTH the Spark TilePyramid and the LocalPyramid mirror
(tests/local_pyramid.py transcribes the reference recursion independently
of the Spark operator layer).
"""

from __future__ import annotations

import json
import math

import pytest

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.functions import kernels as K

pytestmark = pytest.mark.spark


def _lat_for_merc_y(y: float) -> float:
    """Invert convert.hpp:24-27: y = 0.5 - 0.25*ln((1+s)/(1-s))/pi."""
    t = (0.5 - y) * 4.0 * math.pi
    return math.degrees(math.asin(math.tanh(t / 2.0)))


def _fixture_text() -> str:
    lon = (0.2 - 0.5) * 360.0
    lat_a = _lat_for_merc_y(0.2)
    lat_b = _lat_for_merc_y(0.5055)
    return json.dumps(
        {
            "type": "Feature",
            "properties": {"name": "straddler"},
            "geometry": {
                "type": "MultiPoint",
                "coordinates": [[lon, lat_a], [lon, lat_b]],
            },
        }
    )


def test_projection_lands_in_the_straddle_band():
    import numpy as np

    text = _fixture_text()
    coords = json.loads(text)["geometry"]["coordinates"]
    lons = np.array([c[0] for c in coords])
    lats = np.array([c[1] for c in coords])
    xs, ys = K.project_xy(lons, lats)
    p = 0.5 * 64 / 4096
    assert abs(xs[0] - 0.2) < 1e-9 and abs(xs[1] - 0.2) < 1e-9
    assert -p <= ys.min() and ys.max() <= 0.5 + p  # z1 (0,0) keeps both
    lo, hi = (0.5 - p) / 2, (1 + p) / 2
    assert not ((lo <= ys) & (ys <= hi)).any()  # z2 dy=1 window holds neither
    assert ys.min() < hi and ys.max() >= lo  # ...but the bbox overlaps it


def test_spark_drilldown_registers_through_empty_clip(spark):
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

    docs = documents_from_fixture(spark, _fixture_text(), "empties")
    pyr = TilePyramid.from_documents(docs, Options())
    assert pyr.total == 1  # z0 retains source (2 points <= indexMaxPoints)

    t = pyr.get_tile(3, 0, 2)
    assert (t.z, t.x, t.y) == (3, 0, 2)  # registered, NOT the canonical empty
    assert t.features == [] and t.num_points == 0
    assert pyr.total == 13
    assert pyr.stats == {0: 1, 1: 4, 2: 4, 3: 4}

    # a sibling reached through the same drill holds the real point
    t00 = pyr.get_tile(2, 0, 0)
    assert len(t00.features) == 1 and t00.features[0]["type"] == 1
    assert pyr.total == 13  # no new registrations

    # far empty quadrant (no source retained anywhere above it):
    # canonical empty tile, still unregistered — matches geojsonvt.hpp:146-150
    far = pyr.get_tile(3, 7, 7)
    assert far.z == -1
    assert pyr.total == 13


def test_mirror_agrees_with_hand_derivation():
    from tests.local_pyramid import LocalPyramid

    lp = LocalPyramid(_fixture_text())
    assert lp.total == 1
    t = lp.get_tile(3, 0, 2)
    assert (t.z, t.x, t.y) == (3, 0, 2) and t.features == []
    assert lp.total == 13
    assert lp.stats == {0: 1, 1: 4, 2: 4, 3: 4}
