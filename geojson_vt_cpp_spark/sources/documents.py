"""The interleaved documents source (the engine's mandated input shape) and
deterministic synthesis of it from GeoJSON fixtures.

Input table shape (BASELINE.json input_hint):

    documents_geo(doc_id string,
                  spans array<struct<kind:string, text:string,
                                     media_ref:string, offset:int>>)

Synthesis rule (FIXTURES.md §1): one document per top-level feature of the
fixture, ``doc_id = '{fixture}-{i:04d}'``, spans = [text intro,
geojson(feature_i), media(raster tile ref derived from the feature's bbox
center at z=7), text outro] with cumulative character offsets. Feature order
follows the fixture's array order — parity goldens are order-sensitive.

The per-row invariant every pipeline stage must preserve: span-sequence
equality (kind, text, media_ref, order). The engine only ever *reads*
documents (posexplode + filter), so the invariant holds by construction;
:func:`span_sequence_fingerprint` lets tests assert it end-to-end.
"""

from __future__ import annotations

import json
import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_vt_cpp_spark.functions import kernels as K

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _feature_units(geojson_text: str) -> list[str]:
    """Split a fixture into one serialized GeoJSON unit per top-level feature
    (ToFeatureCollection semantics: bare geometry/Feature = one unit)."""
    obj = json.loads(geojson_text)
    if isinstance(obj, dict) and obj.get("type") == "FeatureCollection":
        feats = obj.get("features", [])
        if not feats:
            return []
        return [json.dumps(f, separators=(",", ":")) for f in feats]
    return [json.dumps(obj, separators=(",", ":"))]


def _bbox_center_tile(geojson_unit: str, z: int = 7) -> str:
    """Deterministic raster tile ref from the unit's bbox center."""

    def walk(coords, acc):
        if isinstance(coords[0], (int, float)):
            acc.append(coords[:2])
        else:
            for c in coords:
                walk(c, acc)

    obj = json.loads(geojson_unit)
    geom = obj.get("geometry", obj) if obj.get("type") == "Feature" else obj
    acc: list = []
    if geom and geom.get("type") == "GeometryCollection":
        for g in geom.get("geometries", []):
            if "coordinates" in g:
                walk(g["coordinates"], acc)
    elif geom and "coordinates" in geom and geom["coordinates"]:
        walk(geom["coordinates"], acc)
    if not acc:
        return f"raster://{z}/0/0.png"
    a = np.asarray(acc, dtype=np.float64)
    lon = (a[:, 0].min() + a[:, 0].max()) / 2
    lat = (a[:, 1].min() + a[:, 1].max()) / 2
    px, py = K.project_xy(np.array([lon]), np.array([lat]))
    n = 1 << z
    tx = min(n - 1, max(0, int(math.floor(px[0] * n))))
    ty = min(n - 1, max(0, int(math.floor(py[0] * n))))
    return f"raster://{z}/{tx}/{ty}.png"


def docs_rows_from_fixture(geojson_text: str, fixture: str) -> list[tuple]:
    rows = []
    for i, unit in enumerate(_feature_units(geojson_text)):
        intro = f"doc {i} intro"
        media = _bbox_center_tile(unit)
        outro = "outro"
        spans = []
        off = 0
        for kind, text, media_ref in (
            ("text", intro, ""),
            ("geojson", unit, ""),
            ("media", "", media),
            ("text", outro, ""),
        ):
            spans.append((kind, text, media_ref, off))
            off += max(len(text), len(media_ref))
        rows.append((f"{fixture}-{i:04d}", spans))
    return rows


def documents_from_fixture(
    spark: SparkSession, geojson_text: str, fixture: str
) -> DataFrame:
    rows = docs_rows_from_fixture(geojson_text, fixture)
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    # right-size partitions: createDataFrame scatters tiny fixture sets over
    # defaultParallelism partitions, and every chained mapInPandas stage pays
    # a Python-runner startup PER TASK — 32 near-empty partitions x N stages
    # dominates wall time for small inputs
    n_parts = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 16 + 1))
    return df.coalesce(n_parts)


def span_sequence_fingerprint(docs_df: DataFrame) -> DataFrame:
    """Per-row fingerprint of the span sequence (kind, text, media_ref,
    order) — compare input vs any carried-through output to assert the
    per-row invariant."""
    return docs_df.select(
        "doc_id",
        F.md5(
            F.to_json(
                F.transform(
                    "spans",
                    lambda s: F.struct(
                        s["kind"].alias("kind"),
                        s["text"].alias("text"),
                        s["media_ref"].alias("media_ref"),
                    ),
                )
            )
        ).alias("span_fp"),
    )


def replicate_documents(
    docs_df: DataFrame, copies: int, lon_jitter_deg: float = 150.0
) -> DataFrame:
    """Deterministic scale-up: replicate each document ``copies`` times with
    a per-copy longitude jitter applied to the embedded GeoJSON.

    Used by the benchmark to grow the us-states geometry mix to arbitrary
    row counts without external data. Jitter is a pure function of the copy
    index (seeded, order-stable); geometry stays within [-180, 180).
    """
    idx = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy_idx")
    rep = docs_df.select("doc_id", "spans", idx)

    def kernel(batches):
        import pandas as pd

        def jitter_text(t: str, dlon: float) -> str:
            try:
                obj = json.loads(t)
            except Exception:
                return t

            def shift(coords):
                if isinstance(coords[0], (int, float)):
                    lon = coords[0] + dlon
                    if lon >= 180.0:
                        lon -= 360.0
                    if lon < -180.0:
                        lon += 360.0
                    return [lon] + list(coords[1:])
                return [shift(x) for x in coords]

            def fix(g):
                if g.get("type") == "GeometryCollection":
                    for gg in g.get("geometries", []):
                        fix(gg)
                elif "coordinates" in g and g["coordinates"]:
                    g["coordinates"] = shift(g["coordinates"])

            geom = obj.get("geometry", obj) if obj.get("type") == "Feature" else obj
            if geom:
                fix(geom)
            return json.dumps(obj, separators=(",", ":"))

        for pdf in batches:
            out_rows = []
            for doc_id, spans, c in zip(pdf["doc_id"], pdf["spans"], pdf["copy_idx"]):
                dlon = ((int(c) * 73) % 360 - 180) * lon_jitter_deg / 180.0
                new_spans = [
                    (
                        s["kind"],
                        jitter_text(s["text"], dlon) if s["kind"] == "geojson" else s["text"],
                        s["media_ref"],
                        s["offset"],
                    )
                    for s in spans
                ]
                out_rows.append((f"{doc_id}-{int(c):06d}", new_spans))
            yield pd.DataFrame(out_rows, columns=["doc_id", "spans"])

    return rep.mapInPandas(kernel, DOCUMENTS_SCHEMA)


def synth_points_documents(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic point corpus — the stand-in for the
    reference's ABSENT ``test/fixtures/points.geojson`` (the two Large*
    bench shapes, ``bench/benchmark.cpp:60-79``, index it with default
    options and probe ``getTile(12, 1171, 1566)``).

    Fully Spark-side synthesis (no driver JSON): one single-point document
    per id, spans interleaved text+geojson+media. 80% of the points land
    uniformly in a 1.4°x1.0° box around (-77.05, 38.9) — which contains the
    z12/1171/1566 probe tile, so the drill target is non-empty — and 20%
    spread world-wide. Coordinates derive from md5(tag||id) (the repo's
    portable-hash convention), so any n reproduces bit-identically across
    engines and runs.
    """
    ids = spark.range(n).select(F.col("id"))

    def u(tag: str):
        # 15 hex digits of md5 -> 60-bit uniform in [0, 1)
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            .cast("double")
            / F.lit(float(1 << 60))
        )

    cluster = (F.col("id") % 5) != 0  # 80% clustered
    lon = F.when(cluster, F.lit(-77.75) + u("clon-") * 1.4).otherwise(
        F.lit(-180.0) + u("lon-") * 360.0
    )
    lat = F.when(cluster, F.lit(38.4) + u("clat-") * 1.0).otherwise(
        F.lit(-85.0) + u("lat-") * 170.0
    )
    intro = F.format_string("synthetic point %d. ", F.col("id"))
    gj = F.format_string(
        '{"type":"Feature","id":%d,"geometry":{"type":"Point",'
        '"coordinates":[%.6f,%.6f]},"properties":{}}',
        F.col("id"),
        lon,
        lat,
    )
    span = lambda kind, text, ref, off: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"),
        text.alias("text"),
        ref.alias("media_ref"),
        off.cast("int").alias("offset"),
    )
    null_s = F.lit(None).cast("string")
    return ids.select(
        F.format_string("points-%07d", F.col("id")).alias("doc_id"),
        F.array(
            span("text", intro, null_s, F.lit(0)),
            span("geojson", gj, null_s, F.length(intro)),
            span(
                "media",
                null_s,
                F.format_string("raster://7/%d", F.col("id") % 16384),
                F.length(intro) + F.length(gj),
            ),
        ).alias("spans"),
    )
