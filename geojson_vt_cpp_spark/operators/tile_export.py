"""Tile export: quantized tile features -> Mapbox Vector Tile blobs.

The reference engine stops at in-memory ``TileFeature`` structs
(``/root/reference/include/mapbox/geojsonvt/types.hpp:193-214``) and leaves
serialization to the vt-pbf ecosystem; a user switching to this engine needs
the serving artifact itself, so :func:`tiles_to_mvt` turns the pyramid's
tile-features table into one spec-compliant ``.mvt`` protobuf blob per tile
(functions/mvt.py, vector-tile-spec 2.1).

Scale shape: one hash shuffle on the tile key co-locates each tile's
features, then a single ``mapInPandas`` pass encodes — no driver collect, no
per-row Python UDF. Per-tile feature counts are bounded by the pyramid's
``index_max_points`` splitting, so the in-kernel per-partition groupby holds
one shuffle partition (not one tile) in memory; size
``spark.sql.shuffle.partitions`` for the corpus as usual.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_vt_cpp_spark.functions import mvt
from geojson_vt_cpp_spark.operators import codec

MVT_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mvt", T.BinaryType()),
    ]
)

MVT_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("out_type", T.IntegerType()),
        T.StructField("feature_id", T.StringType()),
        T.StructField("n_parts", T.IntegerType()),
        T.StructField("n_points", T.IntegerType()),
        T.StructField("geom_md5", T.StringType()),
        T.StructField("tags_md5", T.StringType()),
    ]
)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("chunk", T.IntegerType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("pres", T.ArrayType(T.BinaryType())),
        T.StructField("posts", T.ArrayType(T.BinaryType())),
        T.StructField("tag_ints", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("vals", T.ArrayType(T.BinaryType())),
    ]
)


def _encode_group_chunk(grp: pd.DataFrame):
    """One co-located run of feature rows -> an ``encode_chunk`` tuple via
    the columnar fast path: part coordinate arrays flow from Arrow into
    the vectorized geometry encoder without per-point Python."""
    memo: dict = {}  # props strings repeat across features — parse once
    tags = []
    for s in grp["props_json"]:
        t = memo.get(s)
        if t is None:
            t = memo[s] = json.loads(s)
        tags.append(t)
    return mvt.encode_chunk_arrays(
        grp["out_type"].to_numpy(),
        grp["feature_id"].tolist(),
        grp["id_kind"].tolist(),
        tags,
        grp["part_xs"].tolist(),
        grp["part_ys"].tolist(),
    )


def tiles_to_mvt(
    tile_features: DataFrame,
    layer_name: str = "features",
    extent: int = 4096,
    chunk_rows: int | None = None,
) -> DataFrame:
    """TILE_FEATURES_SCHEMA rows -> one row per tile: (z, tx, ty,
    n_features, n_bytes, mvt binary).

    Feature order inside each blob is the engine's canonical emission order
    (SORT_KEYS — the same order the reference preserves), so the bytes are
    deterministic for a given pyramid.

    ``chunk_rows`` enables INTRA-tile encode parallelism: features chunk
    into runs of that many rows, chunks geometry-encode concurrently
    (functions/mvt.py ``encode_chunk`` — the varint geometry walk is ~all
    of the encode cost), and a per-tile assembly pass merges the chunk
    dictionaries first-appearance and splices remapped tag indices —
    byte-identical to the serial encode by construction (pytest-gated).
    This matters because OVERVIEW tiles are not bounded by
    ``index_max_points`` splitting: every input feature appears
    (simplified) in the z0 tile, so at corpus scale the largest tile's
    serial encode is the stage's long pole (measured: the bench fixture's
    stacked corpus caps the default path at ~0.6 two-size efficiency —
    BENCH.md "MVT export scaling"). Default None keeps the single-pass
    plan (no window shuffle) for ordinary tile-size distributions.
    """
    cols = ["z", "tx", "ty", *codec.SORT_KEYS, "out_type", "is_multi",
            "part_xs", "part_ys", "poly_lens", "props_json", "feature_id",
            "id_kind"]
    if chunk_rows:
        return _tiles_to_mvt_chunked(
            tile_features.where(F.col("out_type") > 0).select(*cols),
            layer_name, extent, int(chunk_rows),
        )
    src = (
        tile_features.where(F.col("out_type") > 0)
        .select(*cols)
        .repartition("z", "tx", "ty")
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["z", "tx", "ty", *codec.SORT_KEYS], kind="mergesort")
        out: list[dict] = []
        for (z, tx, ty), grp in pdf.groupby(["z", "tx", "ty"], sort=False):
            chunk = _encode_group_chunk(grp)
            blob = mvt.wrap_layer(
                mvt.assemble_layer(layer_name, [chunk], extent=extent)
            )
            out.append(
                {
                    "z": int(z),
                    "tx": int(tx),
                    "ty": int(ty),
                    "n_features": len(chunk[0]),
                    "n_bytes": len(blob),
                    "mvt": blob,
                }
            )
        yield codec.rows_to_pdf(out, MVT_SCHEMA)

    return src.mapInPandas(kernel, MVT_SCHEMA)


def _tiles_to_mvt_chunked(
    src: DataFrame, layer_name: str, extent: int, chunk_rows: int
) -> DataFrame:
    """The intra-tile parallel plan: window row_number in canonical order
    -> chunk id -> co-locate (tile, chunk) -> encode_chunk kernel (the
    heavy geometry varint walk, parallel ACROSS chunks of one tile) ->
    co-locate tile -> assemble_layer kernel (dict merge + tag splice +
    byte concat only)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("z", "tx", "ty").orderBy(*codec.SORT_KEYS)
    chunked = (
        src.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "chunk", ((F.col("_rn") - F.lit(1)) / F.lit(chunk_rows)).cast("int")
        )
        .repartition("z", "tx", "ty", "chunk")
    )

    def encode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["z", "tx", "ty", "chunk", "_rn"], kind="mergesort")
        out: list[dict] = []
        for (z, tx, ty, ck), grp in pdf.groupby(
            ["z", "tx", "ty", "chunk"], sort=False
        ):
            pres, posts, tag_ints, keys, vals = _encode_group_chunk(grp)
            out.append(
                {
                    "z": int(z), "tx": int(tx), "ty": int(ty), "chunk": int(ck),
                    "n_features": len(pres),
                    "pres": pres, "posts": posts,
                    "tag_ints": [list(t) for t in tag_ints],
                    "keys": keys, "vals": vals,
                }
            )
        yield codec.rows_to_pdf(out, CHUNK_SCHEMA)

    enc = chunked.mapInPandas(encode_kernel, CHUNK_SCHEMA).repartition(
        "z", "tx", "ty"
    )

    def assemble_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["z", "tx", "ty", "chunk"], kind="mergesort")
        out: list[dict] = []
        for (z, tx, ty), grp in pdf.groupby(["z", "tx", "ty"], sort=False):
            parts = [
                (row.pres, row.posts, row.tag_ints, row.keys, row.vals)
                for row in grp.itertuples(index=False)
            ]
            layer = mvt.assemble_layer(layer_name, parts, extent=extent)
            blob = mvt.wrap_layer(layer)
            out.append(
                {
                    "z": int(z), "tx": int(tx), "ty": int(ty),
                    "n_features": int(grp["n_features"].sum()),
                    "n_bytes": len(blob),
                    "mvt": blob,
                }
            )
        yield codec.rows_to_pdf(out, MVT_SCHEMA)

    return enc.mapInPandas(assemble_kernel, MVT_SCHEMA)


def geom_digest(parts: list[list[tuple[int, int]]]) -> str:
    """md5 of the canonical coordinate string — the SAME format the golden
    oracle hashes (functions/golden_oracle.py:_golden_feature_rows), so MVT
    round-trip rows compare directly against golden-derived literals."""
    s = "|".join(";".join(f"{int(x)}:{int(y)}" for x, y in part) for part in parts)
    return hashlib.md5(s.encode()).hexdigest()


def tags_digest(tags: dict) -> str:
    return hashlib.md5(
        json.dumps(tags, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()


def mvt_feature_summary(mvt_df: DataFrame) -> DataFrame:
    """Decode each blob back and emit one digest row per feature — the
    verification surface for MVT export (pairs with the golden-derived
    oracle in functions/golden_oracle.py)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                for layer in mvt.decode_tile(row.mvt):
                    for ft in layer["features"]:
                        out.append(
                            {
                                "z": int(row.z),
                                "tx": int(row.tx),
                                "ty": int(row.ty),
                                "out_type": int(ft["type"]),
                                "feature_id": None if ft["id"] is None else str(ft["id"]),
                                "n_parts": len(ft["parts"]),
                                "n_points": sum(len(p) for p in ft["parts"]),
                                "geom_md5": geom_digest(ft["parts"]),
                                "tags_md5": tags_digest(ft["tags"]),
                            }
                        )
            yield codec.rows_to_pdf(out, MVT_FEATURE_SCHEMA)

    return mvt_df.mapInPandas(kernel, MVT_FEATURE_SCHEMA)
