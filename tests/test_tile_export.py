"""MVT export through the Spark operators: byte-determinism, warm-path
equivalence (Tile.to_mvt == tiles_to_mvt blob for the same tile), and the
decode summary against the pyramid's own tile features."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.functions import mvt
from geojson_vt_cpp_spark.operators import tile_export as TE
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def pyr(spark):
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    p = TilePyramid.from_documents(
        docs, Options(index_max_zoom=7, index_max_points=200, max_zoom=14)
    )
    yield p
    p.close()


@pytest.fixture(scope="module")
def mvt_rows(pyr):
    df = TE.tiles_to_mvt(pyr.tile_features())
    return {(r["z"], r["tx"], r["ty"]): r for r in df.collect()}


def test_blob_per_nonempty_tile(pyr, mvt_rows):
    nonempty = {
        (r["z"], r["tx"], r["ty"])
        for r in pyr.tile_features()
        .where(F.col("out_type") > 0)
        .select("z", "tx", "ty")
        .distinct()
        .collect()
    }
    assert set(mvt_rows) == nonempty


def test_blobs_decode_to_tile_features(pyr, mvt_rows):
    """Every blob decodes to exactly the quantized features of its tile
    (closure-normalized, canonical order)."""
    feats = (
        pyr.tile_features()
        .where(F.col("out_type") > 0)
        .collect()
    )
    from collections import defaultdict

    by_tile = defaultdict(list)
    from geojson_vt_cpp_spark.operators import codec

    for r in feats:
        by_tile[(r["z"], r["tx"], r["ty"])].append(r)
    for key, rows in by_tile.items():
        rows.sort(key=lambda r: tuple(r[k] for k in codec.SORT_KEYS))
        layers = mvt.decode_tile(mvt_rows[key]["mvt"])
        assert len(layers) == 1 and layers[0]["name"] == "features"
        got = layers[0]["features"]
        assert len(got) == len(rows)
        for ft, r in zip(got, rows):
            assert ft["type"] == r["out_type"]
            want_parts = [
                [(int(x), int(y)) for x, y in zip(xs, ys)]
                for xs, ys in zip(r["part_xs"], r["part_ys"])
            ]
            if r["out_type"] == 3:
                want_parts = [
                    p[:-1] if len(p) > 1 and p[0] == p[-1] else p for p in want_parts
                ]
            assert ft["parts"] == want_parts
            assert ft["tags"] == json.loads(r["props_json"])


def test_warm_tile_to_mvt_matches_spark_blob(pyr, mvt_rows, tmp_path):
    """enable_serving + get_tile().to_mvt() (driver-local, no Spark job)
    must produce byte-identical blobs to the distributed export."""
    pyr.enable_serving(str(tmp_path / "serving"))
    for key in [(0, 0, 0), (2, 0, 1), (7, 37, 48)]:
        if key not in mvt_rows:
            continue
        tile = pyr.get_tile(*key)
        assert tile.to_mvt() == mvt_rows[key]["mvt"]


def test_summary_matches_direct_decode(spark, pyr, mvt_rows):
    df = TE.tiles_to_mvt(pyr.tile_features())
    summary = {
        (r["z"], r["tx"], r["ty"], r["geom_md5"])
        for r in TE.mvt_feature_summary(df).collect()
    }
    direct = set()
    for key, row in mvt_rows.items():
        for layer in mvt.decode_tile(row["mvt"]):
            for ft in layer["features"]:
                direct.add((*key, TE.geom_digest(ft["parts"])))
    assert summary == direct


def test_empty_input_yields_no_rows(spark, pyr):
    empty = pyr.tile_features().where(F.lit(False))
    assert TE.tiles_to_mvt(empty).count() == 0


def test_chunked_encode_byte_identical(pyr, mvt_rows):
    """chunk_rows path (window -> chunk encode -> dict-merge assembly) must
    reproduce the serial blobs BYTE-identically at a chunk size small
    enough that every multi-feature tile splits."""
    df = TE.tiles_to_mvt(pyr.tile_features(), chunk_rows=3)
    got = {(r["z"], r["tx"], r["ty"]): r for r in df.collect()}
    assert set(got) == set(mvt_rows)
    for k, r in got.items():
        assert r["n_features"] == mvt_rows[k]["n_features"], k
        assert bytes(r["mvt"]) == bytes(mvt_rows[k]["mvt"]), k


def test_encode_chunk_assembly_invariant_to_chunking():
    """Pure-codec property: any chunking of the ordered feature list
    assembles to the same bytes as the serial encoder (dict indices are
    remapped to global first-appearance order)."""
    feats = [
        {
            "type": 1 + (i % 3),
            "parts": [[(i, i + 1), (i + 2, i)]] if i % 3 else [[(i, i)]],
            "tags": {"name": f"n{i % 4}", "density": float(i % 5), "flag": i % 2 == 0},
            "id": str(i),
            "id_kind": "u64",
        }
        for i in range(23)
    ]
    want = mvt.encode_layer("L", feats)
    for sizes in [(23,), (1,) * 23, (5, 5, 5, 5, 3), (10, 13), (22, 1)]:
        chunks, pos = [], 0
        for s in sizes:
            chunks.append(mvt.encode_chunk(feats[pos:pos + s]))
            pos += s
        assert mvt.assemble_layer("L", chunks) == want, sizes
    # decode sanity on the assembled form
    (layer,) = mvt.decode_tile(mvt.wrap_layer(want))
    assert len(layer["features"]) == 23 and layer["name"] == "L"
