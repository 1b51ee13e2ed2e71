"""Streaming ingest + physical-plan assertions (pushdown, broadcast,
spatial range partitioning)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.functions import cells as C
from geojson_vt_cpp_spark.plans import (
    explain_str,
    is_broadcast_join,
    spatial_repartition,
)
from geojson_vt_cpp_spark.sources.documents import docs_rows_from_fixture
from geojson_vt_cpp_spark.streaming.ingest import stream_extract_features

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark


def test_stream_extract_features(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = docs_rows_from_fixture(load_fixture("us-states.json"), "us-states")
    with open(src / "batch0.json", "w") as f:
        for doc_id, spans in rows[:10]:
            f.write(json.dumps({
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in spans
                ],
            }) + "\n")

    feats = stream_extract_features(spark, str(src), 1e-6)
    assert feats.isStreaming
    q = (
        feats.writeStream.format("memory")
        .queryName("feat_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) n, count(distinct doc_id) d from feat_stream").first()
    assert got["n"] == 10 and got["d"] == 10

    # late/duplicate redelivery: same file content again -> new rows arrive,
    # dedupable on the deterministic identity key
    with open(src / "batch1.json", "w") as f:
        for doc_id, spans in rows[:3]:
            f.write(json.dumps({
                "doc_id": doc_id,
                "spans": [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for k, t, m, o in spans
                ],
            }) + "\n")
    q2 = (
        feats.writeStream.format("memory")
        .queryName("feat_stream2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = spark.sql(
        "select count(*) n, "
        "count(distinct doc_id, span_idx, feature_idx, member_seq) d "
        "from feat_stream2"
    ).first()
    # 13 physical rows (3 docs redelivered), 10 after identity-key dedup
    assert got2["n"] == 13 and got2["d"] == 10


def test_parquet_pushdown_on_cell_column(spark, tmp_path):
    path = str(tmp_path / "cells_parquet")
    df = spark.range(100000).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 99991 / 99991.0).alias("px"),
        ((F.col("id") * 2246822519) % 99989 / 99989.0).alias("py"),
    )
    df = df.withColumn("cell", C.cell_id(F.col("px"), F.col("py"), 10))
    spatial_repartition(df, "cell", 16).write.mode("overwrite").parquet(path)

    back = spark.read.parquet(path).where(F.col("cell") < 1000)
    plan = explain_str(back)
    assert "PushedFilters" in plan and "LessThan(cell,1000)" in plan
    # range partitioning means most files prune: read should touch far fewer
    # rows than a full scan would (verified via count correctness here; file
    # pruning itself is a parquet min/max effect visible in metrics)
    assert back.count() == df.where(F.col("cell") < 1000).count()


def test_broadcast_join_is_planned(spark):
    big = spark.range(10000).select(F.col("id"), (F.col("id") % 100).alias("k"))
    small = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    j = big.join(F.broadcast(small), "k")
    assert is_broadcast_join(j)
