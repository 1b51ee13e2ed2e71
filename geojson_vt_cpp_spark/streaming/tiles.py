"""Incremental vector-tile publishing from a document STREAM.

Composes the engine's batch primitives under Structured Streaming:
per microbatch, new documents are indexed incrementally
(``TilePyramid.append`` — only the tiles their extent touches recompute),
the change set is derived with the tile-diff digest join
(operators/tile_diff.py), and ONLY the changed tiles are re-encoded as
Mapbox Vector Tile blobs (operators/tile_export.py) and published. This is
the live-map pipeline the reference cannot express: geojson-vt-cpp rebuilds
its whole index per dataset change, while a 100-TB stream needs
publish-cost proportional to the CHANGE, not the corpus.

Scale shape per batch: append's narrow clip over new rows + one digest
aggregate per side of the diff join + one co-locating shuffle for the MVT
encode of changed tiles only. The publish sink follows the repo's
exactly-once pattern (streaming/spatial.py:46-62): each batch overwrites
its own deterministic ``batch_id=<N>`` partition, so checkpoint replay
cannot duplicate rows.

State note: the TilePyramid lives on the driver for the lifetime of the
StreamingQuery (level checkpoints are session-local localCheckpoints, as
documented on ``append``). After a process restart, rebuild from the
documents table and resume the stream — the sink's batch directories make
the replay idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from geojson_vt_cpp_spark.config import Options
from geojson_vt_cpp_spark.operators.pyramid import TilePyramid
from geojson_vt_cpp_spark.operators.tile_diff import (
    changed_tiles_from_digests,
    tile_digests,
)
from geojson_vt_cpp_spark.operators.tile_export import tiles_to_mvt


def publish_changed_mvt(
    old_digests: DataFrame | None,
    new_tf: DataFrame,
    layer_name: str = "features",
    extent: int = 4096,
) -> DataFrame:
    """(z, tx, ty, change, n_features, n_bytes, mvt) for every tile whose
    content differs from the ``old_digests`` snapshot (None = everything is
    'added'). Removed tiles carry a NULL blob — the tombstone a consumer
    needs to drop the tile from its cache."""
    if old_digests is None:
        changed = (
            new_tf.select("z", "tx", "ty")
            .distinct()
            .withColumn("change", F.lit("added"))
        )
    else:
        changed = changed_tiles_from_digests(old_digests, tile_digests(new_tf))
    live = changed.where(F.col("change") != "removed")
    # the change set is bounded by the appended features' tile cover (plus
    # registry size on the first batch) — broadcast it into the feature
    # filter so the corpus-sized side never shuffles for the join
    blobs = tiles_to_mvt(
        new_tf.join(F.broadcast(live.select("z", "tx", "ty")), ["z", "tx", "ty"]),
        layer_name=layer_name,
        extent=extent,
    )
    # a live tile with no serializable features (all accounting rows)
    # publishes a legal zero-feature blob, NOT a NULL: NULL is the
    # 'removed' tombstone and must stay unambiguous
    from geojson_vt_cpp_spark.functions import mvt as _mvt

    empty_blob = _mvt.encode_tile([(layer_name, [])], extent=extent)
    return (
        changed.join(blobs, ["z", "tx", "ty"], "left")
        .select(
            "z", "tx", "ty", "change",
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.when(F.col("change") == "removed", F.lit(None).cast("binary"))
            .otherwise(F.coalesce("mvt", F.lit(empty_blob)))
            .alias("mvt"),
        )
        .withColumn(
            "n_bytes",
            F.coalesce(F.length("mvt"), F.lit(0)).cast("int"),
        )
        .select("z", "tx", "ty", "change", "n_features", "n_bytes", "mvt")
    )


def _parquet_dir_rows(path: str) -> int:
    """Row count of a just-written parquet dir from file footers (driver-
    local metadata reads; no Spark job)."""
    import os

    import pyarrow.parquet as _pq

    total = 0
    for fn in os.listdir(path):
        if fn.endswith(".parquet"):
            total += _pq.read_metadata(os.path.join(path, fn)).num_rows
    return total


def _batch_processor(
    options: Options, publish_dir: str, layer_name: str, state: dict
):
    """The foreachBatch body, built as a standalone closure so replay
    semantics are directly testable. The sink is idempotent by
    construction (per-batch overwrite dirs), but ``append`` MUTATES the
    pyramid — an in-process microbatch redelivery (foreachBatch replays a
    batch id after a recovery) must therefore be dropped here, or the
    same documents would index twice. The mutation is recorded in
    ``state["appended"]`` IMMEDIATELY after it succeeds (before the
    publish write), so a redelivery after a failed publish skips the
    re-append and only retries the idempotent write — the pre-append
    digest snapshot is stashed alongside so the retried change set is
    the one the failed publish would have written."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if bid in state["batches"]:
            return  # replayed batch: pyramid already holds these docs
        appended: dict = state.setdefault("appended", {})
        if bid in appended:
            # appended but publish never committed: retry the write only
            pyr = state["pyramid"]
            old_digests = appended[bid]
        else:
            if batch_df.isEmpty():
                return
            pyr = state["pyramid"]
            if pyr is None:
                # fresh in-process state: a publish dir that already holds
                # batches means this is a replay after a restart — seeding
                # the pyramid from this batch alone would silently drop
                # every earlier batch's features from published tiles
                import os as _os

                if _os.path.isdir(publish_dir) and any(
                    d.startswith("batch_id=") for d in _os.listdir(publish_dir)
                ):
                    raise RuntimeError(
                        f"publish_dir {publish_dir!r} already contains "
                        "published batches but the in-process pyramid state "
                        "is empty (restart replay). Rebuild the pyramid from "
                        "the full document history before resuming, or point "
                        "the stream at fresh publish/checkpoint dirs."
                    )
                old_digests = None
                pyr = TilePyramid.from_documents(batch_df, options)
                state["pyramid"] = pyr
            else:
                # snapshot OLD content digests before append invalidates the
                # cached union (one row per tile — registry-bounded)
                old_digests = tile_digests(pyr.tile_features()).localCheckpoint()
                pyr.append(docs_df=batch_df)
            appended[bid] = old_digests  # recorded before the publish write
        out = publish_changed_mvt(
            old_digests,
            pyr.tile_features(),
            layer_name=layer_name,
            extent=options.extent,  # blobs must declare the quantize extent
        )
        bdir = f"{publish_dir}/batch_id={bid}"
        out.write.mode("overwrite").parquet(bdir)
        state["batches"][bid] = _parquet_dir_rows(bdir)
        appended[bid] = None  # publish committed: drop the digest stash

    return process_batch


def stream_documents_to_tiles(
    docs_stream: DataFrame,
    options: Options,
    publish_dir: str,
    checkpoint_dir: str,
    layer_name: str = "features",
    available_now: bool = True,
) -> tuple[StreamingQuery, dict]:
    """Start the incremental tiling stream over a documents-table stream
    (the BASELINE input shape: doc_id + interleaved spans).

    Each microbatch appends its documents to the pyramid and publishes the
    changed tiles' MVT blobs to ``publish_dir/batch_id=<N>`` (overwrite —
    idempotent under replay). Returns (query, state); ``state["pyramid"]``
    holds the live TilePyramid once the first batch lands, and
    ``state["batches"][batch_id]`` the number of change rows that batch
    published (counted driver-locally from the written files' parquet
    footers — no extra Spark job).

    Consumers reconstruct the current tile set as: latest row per (z, tx,
    ty) across batch_ids, dropping 'removed' rows — see
    tests/test_stream_tiles.py for the reference reader.
    """
    state: dict = {"pyramid": None, "batches": {}}
    process_batch = _batch_processor(options, publish_dir, layer_name, state)
    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), state
