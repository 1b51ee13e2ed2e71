"""Tile-level diff between two tile-feature tables (pyramid versions).

The incremental-publishing primitive: after ``TilePyramid.append`` (or any
reindex), downstream consumers re-render ONLY the tiles whose content
changed — ``changed_tiles(old, new)`` returns exactly that set, computed
as a per-tile content digest aggregate plus one full-outer equi-join on
the tile key. Pairs with the TableIO snapshot layer: diff
``read_snapshot(stage, v0)`` against the current version.

Scale shape: the digest is a two-level aggregate (per-row md5 in codegen,
per-tile sorted-concat md5 — collect_list is bounded by one tile's
contents, the same bound tile serving already requires); the join is an
ordinary equi-join on (z, tx, ty) that partition-prunes on z-partitioned
snapshots. No Python, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tile_digests(tile_features: DataFrame) -> DataFrame:
    """(z, tx, ty, n_rows, digest): order-independent content digest per
    tile — md5 over the sorted list of per-row digests of every
    content-bearing column."""
    key = ["z", "tx", "ty"]
    row_digest = F.md5(
        F.to_json(F.struct(*[c for c in tile_features.columns if c not in key]))
    )
    return (
        tile_features.withColumn("_rd", row_digest)
        .groupBy(*key)
        .agg(
            F.count("*").alias("n_rows"),
            F.md5(F.concat_ws("|", F.sort_array(F.collect_list("_rd")))).alias(
                "digest"
            ),
        )
    )


def changed_tiles_from_digests(old_d: DataFrame, new_d: DataFrame) -> DataFrame:
    """``changed_tiles`` over precomputed digest tables — the single home of
    the added/removed/modified classification (the streaming loop snapshots
    the OLD digests before ``append`` invalidates the union, then calls
    this form directly)."""
    o = old_d.select("z", "tx", "ty", F.col("digest").alias("old_digest"))
    n = new_d.select("z", "tx", "ty", F.col("digest").alias("new_digest"))
    j = o.join(n, ["z", "tx", "ty"], "full_outer")
    return j.select(
        "z", "tx", "ty",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .otherwise(F.lit("modified"))
        .alias("change"),
    ).where(
        F.col("old_digest").isNull()
        | F.col("new_digest").isNull()
        | (F.col("old_digest") != F.col("new_digest"))
    )


def changed_tiles(old_tf: DataFrame, new_tf: DataFrame) -> DataFrame:
    """(z, tx, ty, change) for every tile whose content differs between the
    two versions — change in ('added', 'removed', 'modified'). Unchanged
    tiles are absent, so the output size is the CHANGE set, not the
    pyramid."""
    return changed_tiles_from_digests(tile_digests(old_tf), tile_digests(new_tf))
