"""Ingest generality: documents with several geojson spans, spans holding
FeatureCollections, bare geometries, and GeometryCollections — plus global
sequential-id assignment across all of them (convert.hpp:105-110 order)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.convert import extract_features
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.sources.documents import DOCUMENTS_SCHEMA

pytestmark = pytest.mark.spark


def _span(kind, text, ref="", off=0):
    return (kind, text, ref, off)


def _pt(lon, lat):
    return {"type": "Feature", "properties": {"p": 1},
            "geometry": {"type": "Point", "coordinates": [lon, lat]}}


@pytest.fixture(scope="module")
def multi_docs(spark):
    fc = json.dumps({"type": "FeatureCollection",
                     "features": [_pt(10, 10), _pt(20, 20)]})
    bare = json.dumps({"type": "LineString",
                       "coordinates": [[0, 0], [1, 1], [2, 0]]})
    gc = json.dumps({"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [5, 5]},
        {"type": "MultiPoint", "coordinates": [[6, 6], [7, 7]]},
    ]})
    rows = [
        ("doc-a", [_span("text", "intro"), _span("geojson", fc),
                   _span("media", "", "raster://7/1/2.png"), _span("geojson", bare)]),
        ("doc-b", [_span("geojson", gc), _span("text", "outro")]),
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def test_multi_span_extraction_order(spark, multi_docs):
    feats = extract_features(multi_docs, 1e-6)
    rows = feats.orderBy("doc_id", "span_idx", "feature_idx", "member_seq").collect()
    ident = [(r["doc_id"], r["span_idx"], r["feature_idx"], r["member_seq"], r["gtype"])
             for r in rows]
    assert ident == [
        ("doc-a", 1, 0, 0, 1),  # FC feature 0 (point)
        ("doc-a", 1, 1, 0, 1),  # FC feature 1 (point)
        ("doc-a", 3, 0, 0, 2),  # bare LineString
        ("doc-b", 0, 0, 0, 1),  # GC member 0 (point)
        ("doc-b", 0, 0, 1, 4),  # GC member 1 (multipoint), same feature
    ]
    # properties survive; bare geometry gets empty props + null id
    assert json.loads(rows[0]["props_json"]) == {"p": 1}
    assert rows[2]["props_json"] == "{}" and rows[2]["id_kind"] == "null"


def test_generate_id_spans_global_sequence(spark, multi_docs):
    feats = extract_features(multi_docs, 1e-6, generate_id=True)
    rows = feats.orderBy("doc_id", "span_idx", "feature_idx", "member_seq").collect()
    ids = [(r["feature_id"], r["id_kind"]) for r in rows]
    # one uint64 per top-level feature in global (doc, span, feature) order;
    # GeometryCollection members share their feature's id
    assert ids == [("0", "u64"), ("1", "u64"), ("2", "u64"),
                   ("3", "u64"), ("3", "u64")]


def test_generate_id_distributed_matches_broadcast(spark, multi_docs):
    """Forced-distributed span offsets (repartitionByRange + per-partition
    bases) must equal the broadcast path exactly, including at a partition
    count far above the span count (empty partitions exercised)."""
    from geojson_vt_cpp_spark.operators.convert import assign_sequential_ids

    feats = extract_features(multi_docs, 1e-6)
    key_cols = ["doc_id", "span_idx", "feature_idx", "member_seq"]
    want = {
        tuple(r[c] for c in key_cols): r["feature_id"]
        for r in assign_sequential_ids(feats, mode="broadcast").collect()
    }
    got = {
        tuple(r[c] for c in key_cols): r["feature_id"]
        for r in assign_sequential_ids(feats, mode="distributed").collect()
    }
    assert got == want
    assert sorted(int(v) for v in set(want.values())) == [0, 1, 2, 3]


def test_generate_id_distributed_many_spans(spark):
    """Multi-partition span space: 600 single-point spans across 200 docs;
    ids must be the exact global sequence in (doc_id, span_idx) order."""
    from geojson_vt_cpp_spark.operators.convert import assign_sequential_ids

    pt = json.dumps(_pt(1, 1))
    rows = [
        (f"doc-{i:04d}", [_span("geojson", pt) for _ in range(3)])
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS_SCHEMA).repartition(16)
    feats = extract_features(docs, 1e-6)
    out = assign_sequential_ids(feats, mode="distributed")
    got = [
        int(r["feature_id"])
        for r in out.orderBy("doc_id", "span_idx").collect()
    ]
    assert got == list(range(600))


def test_pyramid_over_multi_span_docs(spark, multi_docs):
    pyr = TilePyramid.from_documents(multi_docs, Options(index_max_zoom=2))
    t = pyr.get_tile(0, 0, 0)
    # 2 FC points + 1 line + GC point + GC multipoint = 5 features at z0
    assert len(t.features) == 5
    assert t.num_points == 2 + 3 + 1 + 2
    pyr.close()
