"""GeoJSON text -> ragged-array features, and the convert (project+simplify) step.

Reimplements, from public GeoJSON semantics:

- input normalization ``ToFeatureCollection`` (bare geometry or single Feature
  becomes a one-feature collection; ``include/mapbox/geojsonvt.hpp:24-34``),
- the two parse error messages the reference surfaces
  (``test/test.cpp:397-418``),
- ``detail::convert`` — project + per-part dist/area + Douglas-Peucker
  importance tagging + optional sequential id generation
  (``include/mapbox/geojsonvt/convert.hpp:101-116``).

GeometryCollection features are exploded at ingest into one row per member
(sharing id/props, ordered by ``member_seq``) — output-equivalent to the
reference's flatten-at-tile-emit (``tile.hpp:105-114``) because exploded
members stay adjacent in feature order.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

from geojson_vt_cpp_spark.functions import kernels as K

ID_NULL = "null"
ID_U64 = "u64"
ID_I64 = "i64"
ID_DBL = "dbl"
ID_STR = "str"


@dataclass
class RawFeature:
    """One ingested feature (post collection-explode), coordinates still lon/lat."""

    feature_idx: int  # index within the span's normalized feature collection
    member_seq: int  # index within an exploded GeometryCollection (else 0)
    feature_id: str | None
    id_kind: str
    props_json: str
    geom: K.Geom  # pts hold raw lon/lat (z column zeroed)


def _geom_from_coords(gtype_str: str, coords) -> K.Geom:
    """Build the ragged encoding from GeoJSON coordinate nesting."""

    def pts_of(seq) -> np.ndarray:
        if not seq:
            return np.empty((0, 3))
        a = np.asarray(seq, dtype=np.float64)
        out = np.zeros((a.shape[0], 3))
        out[:, :2] = a[:, :2]
        return out

    if gtype_str == "Point":
        p = np.zeros((1, 3))
        p[0, :2] = coords[:2]
        return K.Geom(K.GT_POINT, p, np.array([1], np.int32), np.zeros(1), np.zeros(1), np.zeros(1))
    if gtype_str == "MultiPoint":
        pts = pts_of(coords)
        return K.Geom(K.GT_MULTIPOINT, pts, np.array([pts.shape[0]], np.int32), np.zeros(1), np.zeros(1), np.zeros(1))
    if gtype_str == "LineString":
        pts = pts_of(coords)
        return K.Geom(K.GT_LINE, pts, np.array([pts.shape[0]], np.int32), np.zeros(1), np.zeros(1), np.zeros(1))
    if gtype_str == "MultiLineString":
        parts = [pts_of(c) for c in coords]
        n = len(parts)
        pts = np.vstack(parts) if parts else np.empty((0, 3))
        return K.Geom(K.GT_MULTILINE, pts, np.array([p.shape[0] for p in parts], np.int32), np.zeros(n), np.zeros(n), np.zeros(n))
    if gtype_str == "Polygon":
        parts = [pts_of(c) for c in coords]
        n = len(parts)
        pts = np.vstack(parts) if parts else np.empty((0, 3))
        return K.Geom(K.GT_POLYGON, pts, np.array([p.shape[0] for p in parts], np.int32), np.zeros(n), np.zeros(n), np.zeros(n))
    if gtype_str == "MultiPolygon":
        parts = []
        poly_lens = []
        for poly in coords:
            rings = [pts_of(c) for c in poly]
            parts.extend(rings)
            poly_lens.append(len(rings))
        n = len(parts)
        pts = np.vstack(parts) if parts else np.empty((0, 3))
        return K.Geom(
            K.GT_MULTIPOLYGON,
            pts,
            np.array([p.shape[0] for p in parts], np.int32),
            np.zeros(n),
            np.zeros(n),
            np.zeros(n),
            np.asarray(poly_lens, np.int32),
        )
    raise ValueError(f"unsupported geometry type {gtype_str}")


def _parse_geometry(obj) -> list[K.Geom]:
    """Parse a geometry object, exploding GeometryCollections depth-first."""
    if not isinstance(obj, dict):
        raise ValueError("GeoJSON must be an object")
    gtype_str = obj.get("type")
    if gtype_str == "GeometryCollection":
        out: list[K.Geom] = []
        for member in obj.get("geometries", []):
            out.extend(_parse_geometry(member))
        return out
    if "coordinates" not in obj:
        # reference error text via mapbox::geojson (test/test.cpp:397-403)
        raise ValueError(f"{gtype_str} geometry must have a coordinates property")
    return [_geom_from_coords(gtype_str, obj["coordinates"])]


def _parse_id(raw) -> tuple[str | None, str]:
    if raw is None:
        return None, ID_NULL
    if isinstance(raw, bool):
        return None, ID_NULL
    if isinstance(raw, str):
        return raw, ID_STR
    if isinstance(raw, int):
        return (str(raw), ID_U64 if raw >= 0 else ID_I64)
    if isinstance(raw, float):
        return (repr(raw), ID_DBL)
    return None, ID_NULL


def _parse_feature(obj, feature_idx: int) -> list[RawFeature]:
    fid, kind = _parse_id(obj.get("id"))
    props = obj.get("properties") or {}
    props_json = json.dumps(props, sort_keys=True, separators=(",", ":"))
    geom_obj = obj.get("geometry")
    if geom_obj is None:
        geoms = [K.Geom(K.GT_EMPTY)]
    else:
        geoms = _parse_geometry(geom_obj)
        if not geoms:  # empty GeometryCollection
            geoms = [K.Geom(K.GT_EMPTY)]
    return [
        RawFeature(feature_idx, m, fid, kind, props_json, g)
        for m, g in enumerate(geoms)
    ]


def parse_geojson(text: str) -> list[RawFeature]:
    """Parse GeoJSON text into normalized features (ToFeatureCollection).

    Raises ValueError with the reference's messages for the two tested error
    paths: non-object input and a geometry missing ``coordinates``.
    """
    try:
        obj = json.loads(text)
    except json.JSONDecodeError as exc:
        raise ValueError(f"invalid JSON: {exc}") from exc
    if not isinstance(obj, dict):
        raise ValueError("GeoJSON must be an object")
    t = obj.get("type")
    if t == "FeatureCollection":
        out: list[RawFeature] = []
        for i, f in enumerate(obj.get("features", [])):
            out.extend(_parse_feature(f, i))
        return out
    if t == "Feature":
        return _parse_feature(obj, 0)
    # bare geometry -> one feature with empty props, null id (geojsonvt.hpp:31-33)
    geoms = _parse_geometry(obj)
    if not geoms:
        geoms = [K.Geom(K.GT_EMPTY)]
    return [RawFeature(0, m, None, ID_NULL, "{}", g) for m, g in enumerate(geoms)]


def convert_geom(raw: K.Geom, tolerance: float) -> K.Geom:
    """Project + per-part dist/area + simplification tagging (convert.hpp).

    ``tolerance`` is the convert-time tolerance, e.g.
    ``(options.tolerance / extent) / 2^maxZoom`` for an index build
    (``geojsonvt.hpp:102-104``).
    """
    gt = raw.gtype
    if gt == K.GT_EMPTY:
        return K.Geom(K.GT_EMPTY)
    x, y = K.project_xy(raw.pts[:, 0], raw.pts[:, 1])
    pts = np.zeros((raw.pts.shape[0], 3))
    pts[:, 0] = x
    pts[:, 1] = y

    nparts = len(raw.part_lens)
    part_meta = np.zeros(nparts)
    seg_start = np.zeros(nparts)
    seg_end = np.zeros(nparts)
    if gt in (K.GT_LINE, K.GT_MULTILINE, K.GT_POLYGON, K.GT_MULTIPOLYGON):
        off = 0
        is_line = gt in (K.GT_LINE, K.GT_MULTILINE)
        for i, n in enumerate(raw.part_lens):
            n = int(n)
            part = pts[off : off + n]
            if n > 0:
                if is_line:
                    part_meta[i] = K.line_dist(part)
                    K.simplify_tag(part, tolerance)
                    seg_end[i] = part_meta[i]  # segStart=0, segEnd=dist
                else:
                    part_meta[i] = K.ring_area(part)
                    K.simplify_tag(part, tolerance)
            off += n
    return K.Geom(
        gt,
        pts,
        raw.part_lens.copy(),
        part_meta,
        seg_start,
        seg_end,
        raw.poly_lens.copy(),
    )
