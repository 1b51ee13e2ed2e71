"""Mapbox Vector Tile (MVT) encoder/decoder — pure Python, from the public
vector-tile-spec 2.1 (protobuf wire format hand-rolled; no protobuf dep in
this environment).

This is the tile SINK a real consumer of the engine needs: the reference
(geojson-vt-cpp) stops at in-memory tile features
(``/root/reference/include/mapbox/geojsonvt/types.hpp`` ``TileFeature``)
and leaves serialization to the companion vt-pbf/tippecanoe ecosystem; here
the quantized tile features (operators/codec.TILE_FEATURES_SCHEMA rows)
serialize straight to spec-compliant ``.mvt`` protobuf blobs, one per tile,
via :func:`operators.tile_export.tiles_to_mvt`.

Wire layout (vector_tile.proto, spec 2.1):

  Tile:    repeated Layer layers = 3
  Layer:   name=1 string, features=2 repeated, keys=3 repeated string,
           values=4 repeated Value, extent=5 uint32, version=15 uint32
  Feature: id=1 uint64, tags=2 packed uint32, type=3 enum
           (1 POINT / 2 LINESTRING / 3 POLYGON), geometry=4 packed uint32
  Value:   exactly one of string=1 / float=2 / double=3 / int=4 /
           uint=5 / sint=6 / bool=7
  Geometry: CommandInteger = (id & 0x7) | (count << 3) with id 1=MoveTo,
           2=LineTo, 7=ClosePath; parameters are zigzag-encoded deltas
           from a cursor that persists across parts of one feature.

Fidelity policy (matches the public vt-pbf conventions):

- polygon rings are written WITHOUT the redundant closing vertex
  (ClosePath carries it), so decode returns closure-normalized rings —
  the same normalization the golden comparator applies
  (tests/golden_utils.py ring-closure rule);
- feature ids: unsigned-integer ids and digit-string ids encode into the
  uint64 ``id`` field (``"02"`` -> 2 — the standard MVT leading-zero
  loss); negative/float/other-string ids are omitted;
- tag values: bool -> bool_value, non-negative int -> int_value,
  negative int -> sint_value, non-integral float -> double_value,
  str -> string_value, None skipped, anything else JSON-stringified;
- unknown protobuf fields are skipped on decode (forward compatibility).
"""

from __future__ import annotations

import json
import struct

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

_CMD_MOVE_TO = 1
_CMD_LINE_TO = 2
_CMD_CLOSE_PATH = 7


# ---------------------------------------------------------------------------
# protobuf primitives


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        return pos + 8
    if wire == 2:
        n, pos = _read_varint(buf, pos)
        return pos + n
    if wire == 5:
        return pos + 4
    raise ValueError(f"unsupported protobuf wire type {wire}")


# ---------------------------------------------------------------------------
# Value (tag values)


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(int(v))
    if isinstance(v, int):
        if v >= 0:
            return _tag(4, 0) + _varint(v)
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 2**53:
            iv = int(v)
            if iv >= 0:
                return _tag(4, 0) + _varint(iv)
            return _tag(6, 0) + _varint(_zigzag(iv))
        return _tag(3, 1) + struct.pack("<d", v)
    if isinstance(v, str):
        payload = v.encode("utf-8")
        return _tag(1, 2) + _varint(len(payload)) + payload
    # objects/arrays: JSON-stringify (vt-pbf convention)
    payload = json.dumps(v, sort_keys=True, separators=(",", ":")).encode("utf-8")
    return _tag(1, 2) + _varint(len(payload)) + payload


def _decode_value(buf: bytes):
    pos = 0
    out = None
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1:  # string
            n, pos = _read_varint(buf, pos)
            out = buf[pos : pos + n].decode("utf-8")
            pos += n
        elif field == 2:  # float
            out = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif field == 3:  # double
            out = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif field == 4:  # int64
            v, pos = _read_varint(buf, pos)
            out = v - (1 << 64) if v >= 1 << 63 else v
        elif field == 5:  # uint64
            out, pos = _read_varint(buf, pos)
        elif field == 6:  # sint64
            v, pos = _read_varint(buf, pos)
            out = _unzigzag(v)
        elif field == 7:  # bool
            v, pos = _read_varint(buf, pos)
            out = bool(v)
        else:
            pos = _skip_field(buf, pos, wire)
    return out


# ---------------------------------------------------------------------------
# geometry commands


def _encode_geometry(gtype: int, parts) -> bytes:
    """parts: sequence of sequences of (x, y) int pairs. Polygon rings may
    arrive closed (first == last); the closing vertex is dropped per spec."""
    cmds: list[int] = []
    cx = cy = 0
    for part in parts:
        pts = list(part)
        if gtype == GEOM_POLYGON and len(pts) > 1 and tuple(pts[0]) == tuple(pts[-1]):
            pts = pts[:-1]
        if not pts:
            continue
        if gtype == GEOM_POINT:
            cmds.append((_CMD_MOVE_TO & 0x7) | (len(pts) << 3))
            for x, y in pts:
                cmds.append(_zigzag(int(x) - cx))
                cmds.append(_zigzag(int(y) - cy))
                cx, cy = int(x), int(y)
            continue
        if len(pts) < 2:
            continue  # degenerate line/ring: unrepresentable, drop the part
        cmds.append((_CMD_MOVE_TO & 0x7) | (1 << 3))
        x0, y0 = (int(v) for v in pts[0])
        cmds.append(_zigzag(x0 - cx))
        cmds.append(_zigzag(y0 - cy))
        cx, cy = x0, y0
        cmds.append((_CMD_LINE_TO & 0x7) | ((len(pts) - 1) << 3))
        for x, y in pts[1:]:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if gtype == GEOM_POLYGON:
            cmds.append((_CMD_CLOSE_PATH & 0x7) | (1 << 3))
    return b"".join(_varint(c) for c in cmds)


def _zigzag_np(d):
    import numpy as np

    d = d.astype(np.int64)
    return ((d << 1) ^ (d >> 63)).astype(np.uint64)


def _varints_np(vals) -> tuple:
    """Vectorized protobuf varint encoding of a uint64 array.

    Returns (buf, nbytes): the concatenated varint bytes as a uint8 array
    and the per-value byte length (for splitting the stream at feature
    boundaries). ~10 masked passes over the array instead of a Python
    loop per BYTE per value — the whole reason the MVT encode path can
    keep up with the numpy quantize kernels feeding it."""
    import numpy as np

    v = vals.astype(np.uint64)
    nbytes = np.ones(len(v), np.int64)
    if len(v) == 0:
        return np.empty(0, np.uint8), nbytes
    k = 1
    # k caps at 9: a uint64 needs at most 10 varint bytes, and the k=10
    # threshold (1 << 70) would wrap in uint64 and loop forever
    while k < 10:
        over = v >= (np.uint64(1) << np.uint64(7 * k))
        if not over.any():
            break
        nbytes += over
        k += 1
    offs = np.empty(len(v) + 1, np.int64)
    offs[0] = 0
    np.cumsum(nbytes, out=offs[1:])
    out = np.zeros(int(offs[-1]), np.uint8)
    rem = v.copy()
    starts = offs[:-1]
    for j in range(int(nbytes.max())):
        lane = nbytes > j
        if not lane.any():
            break
        b = (rem[lane] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[lane] - 1) > j
        out[starts[lane] + j] = b | (more.astype(np.uint8) << 7)
        rem >>= np.uint64(7)
    return out, nbytes


def encode_geometries_np(gtypes, parts_x, parts_y) -> list[bytes]:
    """Batch `_encode_geometry` for many features at once, fully
    vectorized ACROSS features: every part of every feature flattens into
    one coordinate array, ring closure / degenerate drops / cursor deltas
    / command interleaving are index arithmetic, and ONE varint pass
    (:func:`_varints_np`) encodes the whole chunk's command stream, split
    back per feature by byte offsets. Byte-identical to the serial
    encoder (pytest-gated over a randomized shape matrix) — per-feature
    Python calls were the bottleneck, not the varint loop alone."""
    import numpy as np

    nfeat = len(gtypes)
    if nfeat == 0:
        return []
    # ---- flatten the (feature, part) structure
    part_arrays_x: list = []
    part_arrays_y: list = []
    part_feat_l: list[int] = []
    for i, (pxs, pys) in enumerate(zip(parts_x, parts_y)):
        for xs, ys in zip(pxs, pys):
            part_arrays_x.append(np.asarray(xs, dtype=np.int64))
            part_arrays_y.append(np.asarray(ys, dtype=np.int64))
            part_feat_l.append(i)
    nparts = len(part_arrays_x)
    empty = [b""] * nfeat
    if nparts == 0:
        return empty
    gt_arr = np.asarray([int(g) for g in gtypes], np.int64)
    part_feat = np.asarray(part_feat_l, np.int64)
    part_len = np.asarray([len(a) for a in part_arrays_x], np.int64)
    if part_len.sum() == 0:
        return empty  # parts exist but hold no points: all-empty geometries
    part_gt = gt_arr[part_feat]
    flat_x = np.concatenate(part_arrays_x)
    flat_y = np.concatenate(part_arrays_y)
    part_start = np.zeros(nparts + 1, np.int64)
    np.cumsum(part_len, out=part_start[1:])

    # ---- per-part effective length: closed polygon rings drop the
    # redundant closing vertex (ClosePath carries it)
    nonempty = part_len > 0
    first_i = part_start[:-1].clip(max=max(len(flat_x) - 1, 0))
    last_i = (part_start[1:] - 1).clip(min=0)
    closing = (
        (part_gt == GEOM_POLYGON)
        & (part_len > 1)
        & (flat_x[first_i] == flat_x[last_i])
        & (flat_y[first_i] == flat_y[last_i])
        & nonempty
    )
    eff_len = part_len - closing
    valid = np.where(
        part_gt == GEOM_POINT, eff_len > 0, eff_len >= 2
    )  # degenerate line/ring: unrepresentable, drop the whole part

    # ---- kept points (flat): local index < eff_len of a valid part
    point_part = np.repeat(np.arange(nparts), part_len)
    local_j = np.arange(len(flat_x)) - part_start[point_part]
    keep = (local_j < eff_len[point_part]) & valid[point_part]
    kx = flat_x[keep]
    ky = flat_y[keep]
    kpart = point_part[keep]
    kj = local_j[keep]
    if len(kx) == 0:
        return empty
    kfeat = part_feat[kpart]

    # ---- cursor deltas: previous kept point, reset to (0,0) per feature
    prev_x = np.empty_like(kx)
    prev_y = np.empty_like(ky)
    prev_x[0] = 0
    prev_y[0] = 0
    prev_x[1:] = kx[:-1]
    prev_y[1:] = ky[:-1]
    feat_first = np.empty(len(kx), bool)
    feat_first[0] = True
    feat_first[1:] = kfeat[1:] != kfeat[:-1]
    prev_x[feat_first] = 0
    prev_y[feat_first] = 0
    zx = _zigzag_np(kx - prev_x)
    zy = _zigzag_np(ky - prev_y)

    # ---- output layout per kept part:
    #   POINT:     [MoveTo|n<<3, zz pairs...]              -> 1 + 2n values
    #   LINESTRING:[MoveTo|1, zz, zz, LineTo|(n-1), ...]   -> 2 + 2n
    #   POLYGON:   ... + ClosePath                         -> 3 + 2n
    is_pt = part_gt == GEOM_POINT
    is_poly = part_gt == GEOM_POLYGON
    out_len = np.where(
        valid,
        np.where(is_pt, 1 + 2 * eff_len, 2 + 2 * eff_len + is_poly),
        0,
    )
    part_off = np.zeros(nparts + 1, np.int64)
    np.cumsum(out_len, out=part_off[1:])
    total = int(part_off[-1])
    vals = np.zeros(total, np.uint64)
    vp = np.arange(nparts)[valid]
    off_v = part_off[:-1][valid]
    # commands
    vals[off_v[is_pt[valid]]] = (
        (_CMD_MOVE_TO & 0x7) | (eff_len[vp[is_pt[valid]]] << 3)
    ).astype(np.uint64)
    line_v = vp[~is_pt[valid]]
    line_off = part_off[:-1][line_v]
    vals[line_off] = np.uint64((_CMD_MOVE_TO & 0x7) | (1 << 3))
    vals[line_off + 3] = (
        (_CMD_LINE_TO & 0x7) | ((eff_len[line_v] - 1) << 3)
    ).astype(np.uint64)
    poly_v = vp[is_poly[valid]]
    vals[part_off[:-1][poly_v] + 2 + 2 * eff_len[poly_v]] = np.uint64(
        (_CMD_CLOSE_PATH & 0x7) | (1 << 3)
    )
    # coordinates: position of local point j in its part's value run
    pt_part_is_pt = is_pt[kpart]
    pos = part_off[:-1][kpart] + np.where(
        pt_part_is_pt, 1 + 2 * kj, 1 + 2 * kj + (kj > 0)
    )
    vals[pos] = zx
    vals[pos + 1] = zy

    # ---- one varint pass, split at feature byte boundaries
    buf, nbytes = _varints_np(vals)
    feat_val_counts = np.bincount(part_feat, weights=out_len, minlength=nfeat)
    val_bounds = np.zeros(nfeat + 1, np.int64)
    np.cumsum(feat_val_counts.astype(np.int64), out=val_bounds[1:])
    byte_offs = np.zeros(total + 1, np.int64)
    np.cumsum(nbytes, out=byte_offs[1:])
    feat_bytes = byte_offs[val_bounds]
    raw = buf.tobytes()
    return [raw[feat_bytes[i] : feat_bytes[i + 1]] for i in range(nfeat)]


def _decode_geometry(gtype: int, buf: bytes) -> list[list[tuple[int, int]]]:
    vals: list[int] = []
    pos = 0
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        vals.append(v)
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(vals):
        cmd = vals[i]
        i += 1
        cmd_id, count = cmd & 0x7, cmd >> 3
        if cmd_id == _CMD_MOVE_TO:
            for _ in range(count):
                cx += _unzigzag(vals[i])
                cy += _unzigzag(vals[i + 1])
                i += 2
                if gtype == GEOM_POINT:
                    cur.append((cx, cy))
                else:
                    if cur:
                        parts.append(cur)
                    cur = [(cx, cy)]
        elif cmd_id == _CMD_LINE_TO:
            for _ in range(count):
                cx += _unzigzag(vals[i])
                cy += _unzigzag(vals[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == _CMD_CLOSE_PATH:
            if count != 1:
                raise ValueError("ClosePath count must be 1")
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"unknown geometry command {cmd_id}")
    if cur:
        parts.append(cur)
    return parts


# ---------------------------------------------------------------------------
# layer / tile


def _coerce_id(feature_id, id_kind: str | None):
    """uint64 or digit-string ids -> int for the MVT id field; else None."""
    if feature_id is None:
        return None
    if id_kind in (None, "u64", "str"):
        s = str(feature_id)
        if s.isdigit():
            v = int(s)
            if v < 1 << 64:
                return v
    return None


def encode_chunk(features) -> tuple[list, list, list, list, list]:
    """Phase 1 of the parallel layer encoder over feature DICTS: unzips
    them into the columnar form and delegates to
    :func:`encode_chunk_arrays` (the single implementation of the tag
    dictionaries and feature framing).

    Returns (pres, posts, tag_ints, keys, values): per-feature byte pair
    (id prefix / type+geometry suffix), per-feature local index pairs, and
    the chunk dictionaries (values as encoded len-delimited Value bodies).
    """
    import numpy as np

    feats = list(features)
    return encode_chunk_arrays(
        [int(f["type"]) for f in feats],
        [f.get("id") for f in feats],
        [f.get("id_kind") for f in feats],
        [f.get("tags", {}) for f in feats],
        [
            [np.asarray([p[0] for p in part], np.int64) for part in f["parts"]]
            for f in feats
        ],
        [
            [np.asarray([p[1] for p in part], np.int64) for part in f["parts"]]
            for f in feats
        ],
    )


def encode_chunk_arrays(
    gtypes, ids, id_kinds, tags_list, parts_x, parts_y
) -> tuple[list, list, list, list, list]:
    """:func:`encode_chunk` over COLUMNAR feature data — part coordinate
    arrays go straight from Arrow into the vectorized batch geometry
    encoder (:func:`encode_geometries_np`) with no per-point Python.
    Same return contract and bytes as ``encode_chunk``."""
    geoms = encode_geometries_np(gtypes, parts_x, parts_y)
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    value_idx: dict[bytes, int] = {}
    pres: list[bytes] = []
    posts: list[bytes] = []
    tags_out: list[list[int]] = []
    for gt, fid0, idk, tags, geom in zip(gtypes, ids, id_kinds, tags_list, geoms):
        tag_ints: list[int] = []
        for k, v in tags.items():
            if v is None:
                continue
            ki = key_idx.get(k)
            if ki is None:
                ki = key_idx[k] = len(keys)
                keys.append(k)
            ev = _encode_value(v)
            vb = _varint(len(ev)) + ev
            vi = value_idx.get(vb)
            if vi is None:
                vi = value_idx[vb] = len(values)
                values.append(vb)
            tag_ints.extend((ki, vi))
        pre = bytearray()
        fid = _coerce_id(fid0, idk)
        if fid is not None:
            pre += _tag(1, 0) + _varint(fid)
        post = bytearray()
        post += _tag(3, 0) + _varint(int(gt))
        post += _tag(4, 2) + _varint(len(geom)) + geom
        pres.append(bytes(pre))
        posts.append(bytes(post))
        tags_out.append(tag_ints)
    return pres, posts, tags_out, keys, values


def assemble_layer(name: str, chunks, extent: int = 4096) -> bytes:
    """Phase 2 of the parallel layer encoder: merge ordered chunk outputs
    (from :func:`encode_chunk`) into one layer. Chunk dictionaries merge
    in first-appearance order, so the result is BYTE-IDENTICAL to the
    serial ``encode_layer`` over the concatenated feature sequence — any
    chunking of the same ordered features yields the same bytes."""
    gkeys: list[str] = []
    gkey_idx: dict[str, int] = {}
    gvalues: list[bytes] = []
    gvalue_idx: dict[bytes, int] = {}
    remaps: list[tuple[list[int], list[int]]] = []
    for _pres, _posts, _tags, keys, values in chunks:
        kmap: list[int] = []
        for k in keys:
            ki = gkey_idx.get(k)
            if ki is None:
                ki = gkey_idx[k] = len(gkeys)
                gkeys.append(k)
            kmap.append(ki)
        vmap: list[int] = []
        for vb in values:
            vb = bytes(vb)
            vi = gvalue_idx.get(vb)
            if vi is None:
                vi = gvalue_idx[vb] = len(gvalues)
                gvalues.append(vb)
            vmap.append(vi)
        remaps.append((kmap, vmap))
    layer = bytearray()
    layer += _tag(15, 0) + _varint(2)  # version 2 first (writer convention)
    layer += _ld(1, name.encode("utf-8"))
    for (pres, posts, tags, _k, _v), (kmap, vmap) in zip(chunks, remaps):
        for pre, post, ti in zip(pres, posts, tags):
            buf = bytearray(bytes(pre))
            if len(ti):
                packed = b"".join(
                    _varint(kmap[t] if j % 2 == 0 else vmap[t])
                    for j, t in enumerate(ti)
                )
                buf += _tag(2, 2) + _varint(len(packed)) + packed
            buf += bytes(post)
            layer += _ld(2, bytes(buf))
    for k in gkeys:
        layer += _ld(3, k.encode("utf-8"))
    for vb in gvalues:
        layer += _tag(4, 2) + vb
    layer += _tag(5, 0) + _varint(extent)
    return bytes(layer)


def encode_layer(
    name: str,
    features,
    extent: int = 4096,
) -> bytes:
    """features: iterable of dicts with keys ``type`` (1/2/3), ``parts``
    (list of point lists), ``tags`` (dict), optional ``id`` + ``id_kind``.
    The serial form: one chunk through the two-phase encoder (the single
    source of truth for the wire layout)."""
    return assemble_layer(name, [encode_chunk(features)], extent=extent)


def wrap_layer(layer: bytes) -> bytes:
    """A finished layer message -> its tile-level framing (field 3); tiles
    are the concatenation of framed layers."""
    return _ld(3, layer)


def encode_tile(layers: dict[str, list] | list[tuple[str, list]], extent: int = 4096) -> bytes:
    """One or more named layers -> a complete .mvt tile blob."""
    items = layers.items() if isinstance(layers, dict) else layers
    return b"".join(_ld(3, encode_layer(name, feats, extent)) for name, feats in items)


def decode_tile(buf: bytes) -> list[dict]:
    """-> [{name, extent, version, features: [{type, parts, tags, id}]}]"""
    layers = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 3 and wire == 2:
            n, pos = _read_varint(buf, pos)
            layers.append(_decode_layer(buf[pos : pos + n]))
            pos += n
        else:
            pos = _skip_field(buf, pos, wire)
    return layers


def _decode_layer(buf: bytes) -> dict:
    name = ""
    extent = 4096
    version = 1
    keys: list[str] = []
    values: list = []
    feat_bufs: list[bytes] = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1 and wire == 2:
            n, pos = _read_varint(buf, pos)
            name = buf[pos : pos + n].decode("utf-8")
            pos += n
        elif field == 2 and wire == 2:
            n, pos = _read_varint(buf, pos)
            feat_bufs.append(buf[pos : pos + n])
            pos += n
        elif field == 3 and wire == 2:
            n, pos = _read_varint(buf, pos)
            keys.append(buf[pos : pos + n].decode("utf-8"))
            pos += n
        elif field == 4 and wire == 2:
            n, pos = _read_varint(buf, pos)
            values.append(_decode_value(buf[pos : pos + n]))
            pos += n
        elif field == 5 and wire == 0:
            extent, pos = _read_varint(buf, pos)
        elif field == 15 and wire == 0:
            version, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    features = [_decode_feature(fb, keys, values) for fb in feat_bufs]
    return {
        "name": name,
        "extent": extent,
        "version": version,
        "features": features,
    }


def _decode_feature(buf: bytes, keys: list[str], values: list) -> dict:
    fid = None
    gtype = 0
    tags: dict = {}
    parts: list = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if field == 1 and wire == 0:
            fid, pos = _read_varint(buf, pos)
        elif field == 2 and wire == 2:
            n, pos = _read_varint(buf, pos)
            end = pos + n
            ints: list[int] = []
            while pos < end:
                v, pos = _read_varint(buf, pos)
                ints.append(v)
            for ki, vi in zip(ints[0::2], ints[1::2]):
                tags[keys[ki]] = values[vi]
        elif field == 3 and wire == 0:
            gtype, pos = _read_varint(buf, pos)
        elif field == 4 and wire == 2:
            n, pos = _read_varint(buf, pos)
            parts = _decode_geometry(gtype if gtype else GEOM_LINESTRING, buf[pos : pos + n])
            pos += n
        else:
            pos = _skip_field(buf, pos, wire)
    # a geometry that arrived before the type field (field order is not
    # guaranteed by protobuf): re-decode with the known type
    if gtype == GEOM_POINT and len(parts) > 1:
        parts = [[p for part in parts for p in part]]
    return {"type": gtype, "parts": parts, "tags": tags, "id": fid}
