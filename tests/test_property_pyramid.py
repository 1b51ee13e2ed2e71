"""Seeded random-geometry cross-check of the FULL Spark pyramid (wrap +
2-level BFS build + targeted drill-downs) against the LocalPyramid mirror
(tests/local_pyramid.py — an independent transcription of the reference
recursion driving the same numpy kernels).

The golden suites probe fixed inputs; this guards the BFS/drill-down logic
on arbitrary geometry mixes, including dateline-adjacent longitudes (wrap
side copies), boundary-aligned coordinates (exact window-edge hits), and
clip-to-empty retention. Seeded RandomState, not hypothesis: one Spark
pyramid build per example is too slow for example minimization, and fixed
seeds keep failures reproducible."""

from __future__ import annotations

import json

import numpy as np
import pytest

from geojson_vt_cpp_spark.config import Options

pytestmark = pytest.mark.spark


def _coord(rng: np.random.RandomState, span: float, lo: float) -> float:
    if rng.rand() < 0.3:
        # snap to a z1/z2 tile boundary in lon/lat terms (window-edge hits)
        return float(rng.choice([-180.0, -90.0, -45.0, 0.0, 45.0, 90.0, 180.0]))
    return float(lo + rng.rand() * span)


def _lon(rng):
    return _coord(rng, 380.0, -190.0)  # beyond the dateline: exercises wrap


def _lat(rng):
    return _coord(rng, 160.0, -80.0)


def _ring(rng: np.random.RandomState) -> list:
    cx, cy = _lon(rng), float(-60 + rng.rand() * 120)
    r = 1.0 + rng.rand() * 25.0
    nv = rng.randint(3, 8)
    angs = np.sort(rng.rand(nv)) * 2 * np.pi
    ring = [[cx + r * float(np.cos(a)), cy + r * 0.5 * float(np.sin(a))]
            for a in angs]
    ring.append(ring[0])
    return ring


def _line(rng: np.random.RandomState) -> list:
    return [[_lon(rng), _lat(rng)] for _ in range(rng.randint(3, 9))]


def _feature(rng: np.random.RandomState, i: int) -> dict:
    kind = rng.randint(0, 7)
    if kind == 0:
        geom = {"type": "Point", "coordinates": [_lon(rng), _lat(rng)]}
    elif kind == 1:
        geom = {
            "type": "MultiPoint",
            "coordinates": [[_lon(rng), _lat(rng)] for _ in range(rng.randint(2, 7))],
        }
    elif kind == 2:
        geom = {"type": "LineString", "coordinates": _line(rng)}
    elif kind == 3:
        geom = {
            "type": "MultiLineString",
            "coordinates": [_line(rng) for _ in range(rng.randint(2, 4))],
        }
    elif kind == 4:
        geom = {
            "type": "MultiPolygon",
            "coordinates": [[_ring(rng)] for _ in range(rng.randint(2, 4))],
        }
    elif kind == 5:
        geom = {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "Point", "coordinates": [_lon(rng), _lat(rng)]},
                {"type": "LineString", "coordinates": _line(rng)},
            ],
        }
    else:
        geom = {"type": "Polygon", "coordinates": [_ring(rng)]}
    return {"type": "Feature", "properties": {"i": i}, "geometry": geom}


def _collection(seed: int) -> str:
    rng = np.random.RandomState(seed)
    feats = [_feature(rng, i) for i in range(rng.randint(4, 9))]
    return json.dumps({"type": "FeatureCollection", "features": feats})


@pytest.mark.parametrize("seed,line_metrics", [(11, False), (22, False), (33, True)])
def test_pyramid_fuzz_matches_mirror(spark, seed, line_metrics):
    from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
    from geojson_vt_cpp_spark.sources.documents import documents_from_fixture
    from tests.local_pyramid import LocalPyramid

    text = _collection(seed)
    opts = Options(index_max_zoom=2, index_max_points=1, max_zoom=14,
                   line_metrics=line_metrics)

    lp = LocalPyramid(text, opts)
    docs = documents_from_fixture(spark, text, f"fuzz-{seed}")
    pyr = TilePyramid.from_documents(docs, opts)

    # build parity: registration counters and every materialized tile's output
    assert pyr.total == lp.total, f"seed {seed}: total {pyr.total} != {lp.total}"
    assert pyr.stats == lp.stats
    mirror_tiles = {f"z{t.z}-{t.x}-{t.y}": t.features for t in lp.tiles.values()}
    got_tiles = pyr.all_tiles()
    assert got_tiles == mirror_tiles

    # drill parity: seeded targets (hits, misses, wraparound x) drive the
    # same lazy splits in both implementations
    rng = np.random.RandomState(seed + 1000)
    for _ in range(6):
        z = int(rng.randint(3, 6))
        x = int(rng.randint(-1, (1 << z) + 1))  # incl. out-of-range: wraps
        y = int(rng.randint(0, 1 << z))
        t_spark = pyr.get_tile(z, x, y)
        t_local = lp.get_tile(z, x, y)
        from geojson_vt_cpp_spark.config import to_id

        xw = ((x % (1 << z)) + (1 << z)) % (1 << z)
        if to_id(z, xw, y) not in lp.tiles:
            # mirror returned its canonical empty tile (miss, unregistered)
            assert t_spark.z == -1, f"seed {seed} ({z},{x},{y})"
        else:
            assert (t_spark.z, t_spark.x, t_spark.y) == (z, xw, y)
            assert t_spark.features == t_local.features, f"seed {seed} ({z},{x},{y})"
        assert pyr.total == lp.total, f"seed {seed} after ({z},{x},{y})"
        assert pyr.stats == lp.stats
    pyr.close()
