"""Streaming incremental tile publishing: a 3-microbatch document stream
through streaming/tiles.py must converge to the SAME published MVT blobs as
the one-shot batch pipeline over the union corpus, and later batches must
publish only their change set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.operators.tile_export import tiles_to_mvt
from geojson_vt_cpp_spark.sources.documents import documents_from_fixture
from geojson_vt_cpp_spark.streaming.tiles import stream_documents_to_tiles

from .golden_utils import load_fixture

pytestmark = pytest.mark.spark

OPTS = dict(index_max_zoom=4, index_max_points=100)


def _staged_stream(spark, tmp_path, n_groups=3):
    """us-states docs split into n deterministic groups, staged as one
    parquet file each so maxFilesPerTrigger=1 yields one batch per group."""
    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    src = str(tmp_path / "in")
    groups = []
    for i in range(n_groups):
        g = docs.where(F.abs(F.hash("doc_id")) % n_groups == i)
        groups.append(g)
        g.coalesce(1).write.mode("overwrite").parquet(f"{src}/g{i}")
    # one flat source dir: file-source streams one file per trigger
    import glob
    import shutil

    flat = str(tmp_path / "stream_src")
    import os

    os.makedirs(flat)
    for i in range(n_groups):
        (part,) = glob.glob(f"{src}/g{i}/part-*.parquet")
        shutil.copy(part, f"{flat}/{i:03d}.parquet")
    return docs, flat


def _read_current(spark, publish_dir):
    """Reference reader: latest row per tile across batches, removed rows
    dropped -> the consumer's current tile cache."""
    pub = spark.read.parquet(publish_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("z", "tx", "ty").orderBy(F.col("batch_id").desc())
    return (
        pub.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col("change") != "removed"))
        .select("z", "tx", "ty", "n_features", "n_bytes", "mvt")
    )


def test_stream_converges_to_batch_pipeline(spark, tmp_path):
    docs, flat = _staged_stream(spark, tmp_path)
    schema = spark.read.parquet(flat).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    publish = str(tmp_path / "pub")
    q, state = stream_documents_to_tiles(
        stream, Options(**OPTS), publish, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    assert len(state["batches"]) == 3, state["batches"]

    got = {
        (r["z"], r["tx"], r["ty"]): (r["n_features"], bytes(r["mvt"]))
        for r in _read_current(spark, publish).collect()
        if r["n_features"] > 0
    }
    full = TilePyramid.from_documents(docs, Options(**OPTS))
    want = {
        (r["z"], r["tx"], r["ty"]): (r["n_features"], bytes(r["mvt"]))
        for r in tiles_to_mvt(full.tile_features()).collect()
    }
    full.close()
    state["pyramid"].close()
    assert got == want  # byte-identical blobs, any batch arrival order


def test_later_batches_publish_only_changes(spark, tmp_path):
    docs, flat = _staged_stream(spark, tmp_path)
    schema = spark.read.parquet(flat).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    publish = str(tmp_path / "pub")
    q, state = stream_documents_to_tiles(
        stream, Options(**OPTS), publish, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)
    pub = spark.read.parquet(publish)
    per_batch = {
        r["batch_id"]: r["n"]
        for r in pub.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_batch) == {0, 1, 2}
    total_tiles = pub.select("z", "tx", "ty").distinct().count()
    # an incremental batch touches a strict subset of the pyramid
    assert per_batch[1] < total_tiles or per_batch[2] < total_tiles
    # batch rows are (added|modified|removed) only
    kinds = {r["change"] for r in pub.select("change").distinct().collect()}
    assert kinds <= {"added", "modified", "removed"}
    # removed tombstones carry NULL blobs; live rows carry decodable blobs
    assert pub.where(
        (F.col("change") == "removed") & F.col("mvt").isNotNull()
    ).count() == 0
    from geojson_vt_cpp_spark.functions import mvt as M

    sample = pub.where(F.col("mvt").isNotNull()).limit(5).collect()
    for r in sample:
        layers = M.decode_tile(bytes(r["mvt"]))
        assert layers and layers[0]["name"] == "features"
    state["pyramid"].close()


def test_stream_publishes_declared_extent_and_counts(spark, tmp_path):
    """Non-default Options.extent must reach the published MVT layer header
    (a consumer scales coordinates by the declared extent), and
    state['batches'] must report each batch's published change-row count."""
    docs, flat = _staged_stream(spark, tmp_path, n_groups=2)
    schema = spark.read.parquet(flat).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    publish = str(tmp_path / "pub")
    q, state = stream_documents_to_tiles(
        stream, Options(extent=8192, **OPTS), publish, str(tmp_path / "ckpt")
    )
    q.awaitTermination(300)

    from geojson_vt_cpp_spark.functions import mvt as M

    pub = spark.read.parquet(publish)
    sample = pub.where(F.col("mvt").isNotNull()).limit(5).collect()
    assert sample
    for r in sample:
        (layer,) = M.decode_tile(bytes(r["mvt"]))
        assert layer["extent"] == 8192
    # quantized coordinates actually use the wider extent somewhere
    coords = [
        abs(c)
        for r in pub.where(F.col("n_features") > 0).collect()
        for f in M.decode_tile(bytes(r["mvt"]))[0]["features"]
        for part in f["parts"]
        for pt in part
        for c in pt
    ]
    assert max(coords) > 4096

    per_batch = {
        r["batch_id"]: r["n"]
        for r in pub.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert state["batches"] == per_batch
    state["pyramid"].close()


def test_replayed_microbatch_is_dropped(spark, tmp_path):
    """foreachBatch can redeliver a batch id after recovery; append would
    index the same documents twice, so the processor must drop replays —
    pyramid state and published sink must be unchanged by the rerun."""
    import os

    from geojson_vt_cpp_spark.streaming.tiles import _batch_processor

    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    b0 = docs.where(F.abs(F.hash("doc_id")) % 2 == 0)
    b1 = docs.where(F.abs(F.hash("doc_id")) % 2 == 1)
    publish = str(tmp_path / "pub")
    state = {"pyramid": None, "batches": {}}
    proc = _batch_processor(Options(**OPTS), publish, "features", state)
    proc(b0, 0)
    proc(b1, 1)
    total = state["pyramid"].total
    counts = dict(state["batches"])
    mtimes = {
        d: os.path.getmtime(os.path.join(publish, d))
        for d in os.listdir(publish)
    }

    proc(b1, 1)  # replay
    assert state["pyramid"].total == total
    assert state["batches"] == counts
    assert {
        d: os.path.getmtime(os.path.join(publish, d))
        for d in os.listdir(publish)
    } == mtimes  # sink untouched, not merely rewritten equal
    state["pyramid"].close()


def test_replay_after_failed_publish_skips_reappend(spark, tmp_path, monkeypatch):
    """A batch that fails BETWEEN append and the publish write is recorded
    as appended immediately, so its redelivery must retry only the
    idempotent publish — never the pyramid mutation (the double-index
    hazard the replay guard exists for)."""
    import geojson_vt_cpp_spark.streaming.tiles as ST

    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    b0 = docs.where(F.abs(F.hash("doc_id")) % 2 == 0)
    b1 = docs.where(F.abs(F.hash("doc_id")) % 2 == 1)
    publish = str(tmp_path / "pub")
    state = {"pyramid": None, "batches": {}}
    proc = ST._batch_processor(Options(**OPTS), publish, "features", state)
    proc(b0, 0)

    calls = {"n": 0}
    orig = ST.publish_changed_mvt

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected publish failure")
        return orig(*a, **k)

    monkeypatch.setattr(ST, "publish_changed_mvt", flaky)
    with pytest.raises(RuntimeError, match="injected"):
        proc(b1, 1)
    total_after_append = state["pyramid"].total
    assert 1 in state["appended"] and 1 not in state["batches"]

    proc(b1, 1)  # redelivery: publish retried, append skipped
    assert state["pyramid"].total == total_after_append
    assert state["batches"][1] > 0

    # published content equals a clean (no-failure) run of the same batches
    state2 = {"pyramid": None, "batches": {}}
    publish2 = str(tmp_path / "pub2")
    proc2 = ST._batch_processor(Options(**OPTS), publish2, "features", state2)
    proc2(b0, 0)
    proc2(b1, 1)
    assert state["batches"] == state2["batches"]
    a = sorted(
        (r["z"], r["tx"], r["ty"], r["n_features"], bytes(r["mvt"] or b""))
        for r in _read_current(spark, publish).collect()
    )
    b = sorted(
        (r["z"], r["tx"], r["ty"], r["n_features"], bytes(r["mvt"] or b""))
        for r in _read_current(spark, publish2).collect()
    )
    assert a == b
    state["pyramid"].close()
    state2["pyramid"].close()


def test_restart_replay_with_existing_publish_fails_loudly(spark, tmp_path):
    """A fresh in-process state pointed at a publish_dir that already holds
    batches is a restart replay: seeding the pyramid from one batch would
    silently drop earlier batches' features, so the processor must refuse."""
    import geojson_vt_cpp_spark.streaming.tiles as ST

    docs = documents_from_fixture(spark, load_fixture("us-states.json"), "us-states")
    b0 = docs.where(F.abs(F.hash("doc_id")) % 2 == 0)
    publish = str(tmp_path / "pub")
    state = {"pyramid": None, "batches": {}}
    proc = ST._batch_processor(Options(**OPTS), publish, "features", state)
    proc(b0, 0)
    state["pyramid"].close()

    fresh = {"pyramid": None, "batches": {}}
    proc2 = ST._batch_processor(Options(**OPTS), publish, "features", fresh)
    with pytest.raises(RuntimeError, match="restart replay"):
        proc2(b0, 0)
