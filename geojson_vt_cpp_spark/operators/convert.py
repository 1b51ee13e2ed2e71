"""Ingest stage: interleaved documents table -> projected/tagged features.

Spark re-expression of the reference's entry normalization + ``convert``
(``geojsonvt.hpp:24-34,102-104`` / ``convert.hpp:101-116``):

documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)
  -> posexplode spans -> filter kind='geojson'
  -> mapInPandas: GeoJSON parse + normalize + project + simplify-tag
  -> features table (codec.FEATURES_SCHEMA)

Feature identity/order is (doc_id, span_idx, feature_idx, member_seq) so any
output row maps back to its source span — the per-row span-sequence
invariant is preserved because documents are never mutated, only referenced.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.functions import geojson_io as GJ
from geojson_vt_cpp_spark.operators import codec
from geojson_vt_cpp_spark.operators.clip_stage import iter_rows


def extract_features(
    docs_df: DataFrame,
    tolerance: float,
    generate_id: bool = False,
    kind: str = "geojson",
    on_error: str = "raise",
) -> DataFrame:
    """documents -> features at the given convert tolerance.

    ``tolerance`` is ``(options.tolerance/extent)/2^maxZoom`` for an index
    build or ``.../2^z`` for a one-shot slice. ``generate_id=True`` assigns
    sequential uint64 ids in global input order (doc_id, span_idx,
    feature_idx) — the deterministic equivalent of the reference's
    ``genId++`` over the input collection (``convert.hpp:105-110``);
    GeometryCollection members share their feature's id.
    """
    spans = docs_df.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    )
    gj = spans.where(F.col("span.kind") == kind).select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.col("span.text").alias("gj_text"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for row in iter_rows(pdf):
                try:
                    raws = GJ.parse_geojson(row["gj_text"])
                except ValueError:
                    if on_error == "skip":
                        continue
                    raise
                for rf in raws:
                    out = {
                        "doc_id": row["doc_id"],
                        "span_idx": int(row["span_idx"]),
                        "feature_idx": rf.feature_idx,
                        "member_seq": rf.member_seq,
                        "copy_tag": 1,  # wrap copies get 0 (left) / 2 (right)
                        "slice_path": "",
                        "feature_id": rf.feature_id,
                        "id_kind": rf.id_kind,
                        "props_json": rf.props_json,
                    }
                    out.update(codec.geom_to_cols(GJ.convert_geom(rf.geom, tolerance)))
                    rows.append(out)
            yield codec.rows_to_pdf(rows, codec.FEATURES_SCHEMA)

    feats = gj.mapInPandas(kernel, codec.FEATURES_SCHEMA)
    if generate_id:
        feats = assign_sequential_ids(feats)
    return feats


def assign_sequential_ids(feats: DataFrame) -> DataFrame:
    """Overwrite ids with the global input-order uint64 sequence.

    Two-phase, no global window: count top-level features per span, compute
    span offsets on the driver (spans are few relative to features), then
    broadcast-join the offsets back and add feature_idx. At 10^12-doc scale
    the offsets step becomes a repartitionByRange + per-partition-count pass
    (same algorithm, offsets kept distributed); the broadcast variant keeps
    small/medium builds to a single tiny shuffle.
    """
    spark = feats.sparkSession
    counts = (
        feats.where(F.col("member_seq") == 0)
        .groupBy("doc_id", "span_idx")
        .agg(F.count("*").alias("n_feats"))
        .collect()
    )
    counts.sort(key=lambda r: (r["doc_id"], r["span_idx"]))
    offsets = []
    acc = 0
    for r in counts:
        offsets.append((r["doc_id"], r["span_idx"], acc))
        acc += r["n_feats"]
    off_df = spark.createDataFrame(offsets, "doc_id string, span_idx int, id_offset long")
    return (
        feats.join(F.broadcast(off_df), ["doc_id", "span_idx"], "left")
        .withColumn(
            "feature_id",
            (F.col("id_offset") + F.col("feature_idx")).cast("string"),
        )
        .withColumn("id_kind", F.lit(GJ.ID_U64))
        .drop("id_offset")
        .select(*[f.name for f in codec.FEATURES_SCHEMA.fields])
    )
