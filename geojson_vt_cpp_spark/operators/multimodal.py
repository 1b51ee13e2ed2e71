"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract steps run as Arrow-batched kernels over
``mapInPandas``. The actual codecs are NOT available in this environment
(no PIL/ffmpeg), so decode is STUBBED: ``decode_image_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake decode (seeded by the payload hash) with the real batch
shape, schema, and partitioning — so the Spark-side plumbing is fully
exercised and tested while the codec slot stays swappable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_ref string, payload binary, media_kind string, "
    "width int, height int"
)


def synthesize_media_table(docs_df: DataFrame) -> DataFrame:
    """Deterministic opaque payloads + typed metadata from the documents
    table (no external data): payload = md5-chain bytes, dims = hash-derived.
    Mirrors the mm_media_meta dual-dialect query so metadata cross-checks."""
    return docs_df.select(
        "doc_id",
        F.concat(F.lit("raster://7/"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.unhex(F.md5(F.concat(F.lit("media-"), F.col("doc_id").cast("string")))).alias("payload"),
        F.lit("image/png").alias("media_kind"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("w-"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("bigint") % 1920 + 1
        ).cast("int").alias("width"),
        (
            F.conv(F.substring(F.md5(F.concat(F.lit("h-"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("bigint") % 1080 + 1
        ).cast("int").alias("height"),
    )


def decode_image_stub(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """Codec slot. Real decoders are absent from this container."""
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass fake=True for the deterministic test double"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_image_features(media_df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """decode -> per-channel mean/std feature extraction, Arrow-batched.

    The kernel receives whole Arrow batches; per-image work is numpy. At
    scale the input should be pre-partitioned by size class so batches have
    homogeneous decode cost (``df.repartitionByRange('width')``).
    """
    schema = (
        "doc_id long, width int, height int, mean_r double, mean_g double, "
        "mean_b double, std_gray double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image_stub(
                    bytes(r["payload"]), int(r["width"]), int(r["height"]),
                    fake=fake_decode,
                )
                gray = img.mean(axis=2)
                rows.append(
                    {
                        "doc_id": int(r["doc_id"]),
                        "width": int(r["width"]),
                        "height": int(r["height"]),
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_gray": float(gray.std()),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "std_gray"]
            )

    return media_df.mapInPandas(kernel, schema)
