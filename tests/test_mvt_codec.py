"""MVT codec tests: spec-example byte fixtures (hand-derivable from the
public vector-tile-spec 2.1 document), round-trip properties, value typing,
id coercion, and forward-compat field skipping. Pure Python — no Spark."""

import json
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geojson_vt_cpp_spark.functions import mvt


# ---------------------------------------------------------------------------
# spec examples (vector-tile-spec 2.1 §4.3.5)


def test_spec_point_commands():
    # §4.3.5.1: point (25, 17) -> [9, 50, 34]
    assert list(mvt._encode_geometry(1, [[(25, 17)]])) == [9, 50, 34]


def test_spec_multipoint_commands():
    # §4.3.5.2: points (5,7) and (3,2) -> MoveTo{2}: [17, 10, 14, 3, 9]
    assert list(mvt._encode_geometry(1, [[(5, 7), (3, 2)]])) == [17, 10, 14, 3, 9]


def test_spec_multilinestring_commands():
    # §4.3.5.4: (2,2)-(2,10)-(10,10) and (1,1)-(3,5)
    got = mvt._encode_geometry(2, [[(2, 2), (2, 10), (10, 10)], [(1, 1), (3, 5)]])
    assert list(got) == [9, 4, 4, 18, 0, 16, 16, 0, 9, 17, 17, 10, 4, 8]


def test_spec_polygon_commands():
    # §4.3.5.5: ring (3,6)-(8,12)-(20,34) closed -> MoveTo, LineTo{2}, Close
    got = mvt._encode_geometry(3, [[(3, 6), (8, 12), (20, 34), (3, 6)]])
    assert list(got) == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_zigzag():
    for v, z in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2147483647, 4294967294)]:
        assert mvt._zigzag(v) == z
        assert mvt._unzigzag(z) == v


def test_varint_boundaries():
    for v in [0, 1, 127, 128, 16383, 16384, 2**32, 2**63]:
        buf = mvt._varint(v)
        got, pos = mvt._read_varint(buf, 0)
        assert got == v and pos == len(buf)


# ---------------------------------------------------------------------------
# layer / tile round trip


def _rt(feats, **kw):
    blob = mvt.encode_tile([("layer0", feats)], **kw)
    layers = mvt.decode_tile(blob)
    assert len(layers) == 1
    return layers[0]


def test_layer_header_fields():
    L = _rt([{"type": 1, "parts": [[(0, 0)]], "tags": {}}], extent=8192)
    assert L["name"] == "layer0"
    assert L["version"] == 2
    assert L["extent"] == 8192


def test_value_typing_round_trip():
    tags = {
        "s": "hello",
        "i": 7,
        "neg": -42,
        "big": 2**40,
        "d": 1.264,
        "b_t": True,
        "b_f": False,
        "obj": {"k": [1, 2]},
    }
    L = _rt([{"type": 1, "parts": [[(1, 1)]], "tags": tags}])
    got = L["features"][0]["tags"]
    assert got["s"] == "hello" and got["i"] == 7 and got["neg"] == -42
    assert got["big"] == 2**40
    assert got["d"] == 1.264 and isinstance(got["d"], float)
    assert got["b_t"] is True and got["b_f"] is False
    assert json.loads(got["obj"]) == {"k": [1, 2]}


def test_integral_float_collapses_to_int():
    # vt-pbf convention: value % 1 == 0 -> integer encoding
    L = _rt([{"type": 1, "parts": [[(0, 0)]], "tags": {"v": 5.0, "n": -3.0}}])
    assert L["features"][0]["tags"] == {"v": 5, "n": -3}


def test_none_tags_skipped():
    L = _rt([{"type": 1, "parts": [[(0, 0)]], "tags": {"a": None, "b": 1}}])
    assert L["features"][0]["tags"] == {"b": 1}


def test_key_value_tables_dedupe():
    feats = [
        {"type": 1, "parts": [[(i, i)]], "tags": {"name": "same", "idx": 1}}
        for i in range(10)
    ]
    blob1 = mvt.encode_tile([("l", feats)])
    solo = mvt.encode_tile([("l", feats[:1])])
    # 10 features sharing one key/value set must NOT cost 10x the strings
    assert len(blob1) < len(solo) + 9 * 24


def test_id_coercion():
    feats = [
        {"type": 1, "parts": [[(0, 0)]], "tags": {}, "id": "02", "id_kind": "str"},
        {"type": 1, "parts": [[(0, 0)]], "tags": {}, "id": "CA", "id_kind": "str"},
        {"type": 1, "parts": [[(0, 0)]], "tags": {}, "id": "9", "id_kind": "u64"},
        {"type": 1, "parts": [[(0, 0)]], "tags": {}, "id": "-4", "id_kind": "i64"},
        {"type": 1, "parts": [[(0, 0)]], "tags": {}},
    ]
    L = _rt(feats)
    ids = [f["id"] for f in L["features"]]
    assert ids == [2, None, 9, None, None]


def test_polygon_closing_vertex_dropped():
    ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    L = _rt([{"type": 3, "parts": [ring], "tags": {}}])
    assert L["features"][0]["parts"] == [ring[:-1]]
    # already-open ring encodes identically
    L2 = _rt([{"type": 3, "parts": [ring[:-1]], "tags": {}}])
    assert L2["features"][0]["parts"] == [ring[:-1]]


def test_multipolygon_rings_sequential():
    rings = [
        [(0, 0), (100, 0), (100, 100), (0, 100)],
        [(20, 20), (20, 40), (40, 40)],  # interior
        [(200, 200), (300, 200), (300, 300)],  # second polygon exterior
    ]
    L = _rt([{"type": 3, "parts": rings, "tags": {}}])
    assert L["features"][0]["parts"] == rings


def test_negative_buffer_coords():
    # tile-local coords can be negative (64px buffer) — zigzag handles
    part = [(-256, -256), (4352, -256), (4352, 4352), (-256, 4352)]
    L = _rt([{"type": 3, "parts": [part], "tags": {}}])
    assert L["features"][0]["parts"] == [part]


def test_cursor_persists_across_features_resets_between():
    # cursor is per-feature: two identical features must decode identically
    f = {"type": 2, "parts": [[(100, 100), (200, 200)]], "tags": {}}
    L = _rt([f, dict(f)])
    assert L["features"][0]["parts"] == L["features"][1]["parts"]


def test_multi_layer_tile():
    blob = mvt.encode_tile(
        [
            ("roads", [{"type": 2, "parts": [[(0, 0), (1, 1)]], "tags": {}}]),
            ("pois", [{"type": 1, "parts": [[(5, 5)]], "tags": {"n": 1}}]),
        ]
    )
    layers = mvt.decode_tile(blob)
    assert [L["name"] for L in layers] == ["roads", "pois"]
    assert layers[1]["features"][0]["tags"] == {"n": 1}


def test_unknown_fields_skipped():
    # forward compatibility: splice an unknown field into layer and tile
    inner = mvt.encode_layer("l", [{"type": 1, "parts": [[(3, 4)]], "tags": {}}])
    inner += mvt._tag(9, 0) + mvt._varint(12345)  # unknown varint field
    inner += mvt._tag(10, 2) + mvt._varint(3) + b"xyz"  # unknown bytes field
    inner += mvt._tag(11, 1) + struct.pack("<d", 1.5)  # unknown 64-bit field
    blob = mvt._ld(3, inner) + mvt._tag(7, 0) + mvt._varint(1)
    layers = mvt.decode_tile(blob)
    assert layers[0]["features"][0]["parts"] == [[(3, 4)]]


def test_degenerate_parts_dropped():
    # 1-point "line" part is unrepresentable in MVT; empty part skipped
    L = _rt([{"type": 2, "parts": [[(1, 1)], [(0, 0), (2, 2)], []], "tags": {}}])
    assert L["features"][0]["parts"] == [[(0, 0), (2, 2)]]


def test_close_path_count_must_be_one():
    bad = mvt._varint((7 & 0x7) | (2 << 3))
    with pytest.raises(ValueError, match="ClosePath"):
        mvt._decode_geometry(3, bad)


# ---------------------------------------------------------------------------
# property-based round trip

_coord = st.integers(min_value=-32768, max_value=32767)
_point = st.tuples(_coord, _coord)


@settings(max_examples=60, deadline=None)
@given(
    gtype=st.sampled_from([1, 2, 3]),
    data=st.data(),
)
def test_roundtrip_property(gtype, data):
    if gtype == 1:
        parts = [data.draw(st.lists(_point, min_size=1, max_size=20))]
    else:
        parts = data.draw(
            st.lists(st.lists(_point, min_size=2, max_size=12), min_size=1, max_size=5)
        )
        if gtype == 3:
            # rings need >= 2 distinct walk points after closure-drop;
            # synthesize open rings (first != last) to keep it simple
            parts = [p for p in parts if tuple(p[0]) != tuple(p[-1])]
            if not parts:
                parts = [[(0, 0), (1, 0), (1, 1)]]
    tags = data.draw(
        st.dictionaries(
            st.text(min_size=1, max_size=8),
            st.one_of(
                st.integers(min_value=-(2**62), max_value=2**62),
                st.text(max_size=12),
                st.booleans(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
            ),
            max_size=5,
        )
    )
    L = _rt([{"type": gtype, "parts": parts, "tags": tags}])
    ft = L["features"][0]
    assert ft["type"] == gtype
    assert ft["parts"] == [[tuple(p) for p in part] for part in parts]
    expect_tags = {
        k: (int(v) if isinstance(v, float) and v.is_integer() and abs(v) < 2**53 else v)
        for k, v in tags.items()
    }
    assert ft["tags"] == expect_tags


def test_vectorized_geometry_encoder_byte_identical():
    """encode_geometries_np must reproduce _encode_geometry byte-for-byte
    over a randomized matrix of types, part shapes, closed/open rings,
    negative deltas, and multi-byte varint magnitudes."""
    import random

    import numpy as np

    from geojson_vt_cpp_spark.functions import mvt as M

    rng = random.Random(42)
    gtypes, pxs, pys, want = [], [], [], []
    for i in range(200):
        gt = rng.choice([M.GEOM_POINT, M.GEOM_LINESTRING, M.GEOM_POLYGON])
        nparts = rng.randint(1, 4)
        fx, fy, parts = [], [], []
        for _ in range(nparts):
            n = rng.choice([0, 1, 2, 3, 8, 40])
            xs = [rng.randint(-70000, 70000) for _ in range(n)]
            ys = [rng.randint(-70000, 70000) for _ in range(n)]
            if gt == M.GEOM_POLYGON and n >= 3 and rng.random() < 0.5:
                xs[-1], ys[-1] = xs[0], ys[0]  # closed ring form
            fx.append(np.array(xs, np.int64))
            fy.append(np.array(ys, np.int64))
            parts.append(list(zip(xs, ys)))
        gtypes.append(gt)
        pxs.append(fx)
        pys.append(fy)
        want.append(M._encode_geometry(gt, parts))
    got = M.encode_geometries_np(gtypes, pxs, pys)
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"feature {i}: {g.hex()} != {w.hex()}"


def test_encode_chunk_arrays_matches_encode_chunk():
    from geojson_vt_cpp_spark.functions import mvt as M

    feats = [
        {
            "type": 1 + (i % 3),
            "parts": [[(i * 3, -i), (i + 9, i * 2), (i * 3, -i)]],
            "tags": {"name": f"n{i % 3}", "d": float(i), "neg": -i},
            "id": str(i),
            "id_kind": "u64",
        }
        for i in range(40)
    ]
    import numpy as np

    a = M.encode_chunk(feats)
    b = M.encode_chunk_arrays(
        [f["type"] for f in feats],
        [f["id"] for f in feats],
        [f["id_kind"] for f in feats],
        [f["tags"] for f in feats],
        [[np.array([p[0] for p in part]) for part in f["parts"]] for f in feats],
        [[np.array([p[1] for p in part]) for part in f["parts"]] for f in feats],
    )
    assert a == b
    assert M.assemble_layer("L", [a]) == M.assemble_layer("L", [b])


def test_vectorized_encoder_empty_and_huge_delta_edges():
    """All-empty parts must yield b'' per feature (serial parity, no
    IndexError), and huge coordinate deltas must terminate with the same
    multi-byte varints as the arbitrary-precision serial path."""
    import numpy as np

    from geojson_vt_cpp_spark.functions import mvt as M

    e = np.array([], np.int64)
    got = M.encode_geometries_np(
        [M.GEOM_LINESTRING, M.GEOM_POINT], [[e], [e, e]], [[e], [e, e]]
    )
    assert got == [b"", b""]
    assert M._encode_geometry(M.GEOM_LINESTRING, [[]]) == b""

    big = [(0, 0), (1 << 40, -(1 << 40)), (-(1 << 41), 1 << 39)]
    want = M._encode_geometry(M.GEOM_LINESTRING, [big])
    (g,) = M.encode_geometries_np(
        [M.GEOM_LINESTRING],
        [[np.array([p[0] for p in big], np.int64)]],
        [[np.array([p[1] for p in big], np.int64)]],
    )
    assert g == want

    buf, nb = M._varints_np(np.array([0, 1, (1 << 64) - 1], np.uint64))
    assert list(nb) == [1, 1, 10]
    assert bytes(buf[2:]) == M._varint((1 << 64) - 1)
