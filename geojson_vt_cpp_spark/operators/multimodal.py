"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract steps run as Arrow-batched kernels over
``mapInPandas``.

Image decode is REAL for PNG: payloads starting with the PNG signature go
through the from-scratch pure-numpy codec
(:mod:`geojson_vt_cpp_spark.functions.png` — stdlib zlib + all five
scanline filters, public PNG spec). Audio decode is REAL for WAV (stdlib
``wave`` + numpy, :mod:`geojson_vt_cpp_spark.functions.wav`). Other
formats (JPEG, MP3 etc.) need codec
libraries absent from this container, so they raise
``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake decode (seeded by the payload hash) with the real
batch shape, schema, and partitioning — the oracle-checked path, since
the synthesized corpora carry hash-derived payloads, not encoded files.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geojson_vt_cpp_spark.functions.jpeg import JPEG_SOI, decode_jpeg
from geojson_vt_cpp_spark.functions.png import PNG_SIGNATURE, decode_png

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
    """Codec slot: real pure-numpy decode for PNG (all legal depths +
    Adam7) and JPEG (baseline AND progressive) payloads via magic-byte
    dispatch; deterministic fake (payload-hash-seeded) when ``fake=True``;
    NotImplementedError for formats whose codecs are absent from this
    container (GIF/WebP/AVIF etc.).

    The real path always returns (h, w, 3): gray/gray+alpha/RGBA decode
    results are normalized to RGB (alpha dropped, gray broadcast) so every
    downstream feature kernel sees one channel layout.
    """
    if not fake:
        img = None
        if payload[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
            img = decode_png(payload)
        elif payload[: len(JPEG_SOI)] == JPEG_SOI:
            img = decode_jpeg(payload)
        if img is not None:
            if img.shape[2] == 4:  # RGBA -> RGB
                img = img[:, :, :3]
            elif img.shape[2] == 2:  # gray+alpha -> gray
                img = img[:, :, :1]
            if img.shape[2] == 1:  # gray -> RGB broadcast
                img = np.repeat(img, 3, axis=2)
            return img
        raise NotImplementedError(
            "non-PNG/JPEG image decode requires a codec library not present "
            "in this environment; pass fake=True for the deterministic test "
            "double"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


ENCODED_MEDIA_BASE_ID = 1000  # real-encoded corpus ids sit above the fakes


def encoded_media_rows(n: int = 12) -> list[tuple]:
    """Deterministic REAL-encoded payload corpus: row i carries a small
    hash-seeded RGB image encoded through the from-scratch codecs —
    round-robin PNG / JPEG 4:4:4 / JPEG 4:2:0 / grayscale JPEG /
    progressive JPEG / Adam7-interlaced PNG — so the driver-oracled
    ``mm_image_features`` exercises the real decode paths
    (incl. lossy + progressive JPEG) end to end. Shared verbatim by the Spark query
    (:func:`__spark_entry__._mm_image_features`) and its literal oracle
    (functions/golden_oracle.py): both sides run the same deterministic
    encode, so the decoded features agree bit-for-bit.

    Returns (doc_id, media_ref, payload, media_kind, width, height).
    """
    from geojson_vt_cpp_spark.functions.jpeg import encode_jpeg
    from geojson_vt_cpp_spark.functions.png import encode_png

    rows = []
    for i in range(n):
        doc_id = ENCODED_MEDIA_BASE_ID + i
        w = 24 + (i % 5) * 8
        h = 16 + (i % 3) * 8
        seed_payload = hashlib.md5(f"enc-{i}".encode()).digest()
        img = decode_image_stub(seed_payload, w, h, fake=True)
        fmt = ("png", "jpeg444", "jpeg420", "jpeg_gray", "jpeg_prog", "png_adam7")[i % 6]
        if fmt == "png":
            payload, kind = encode_png(img), "image/png"
        elif fmt == "png_adam7":
            payload, kind = encode_png(img, interlace=True), "image/png"
        elif fmt == "jpeg444":
            payload, kind = encode_jpeg(img, quality=85, subsampling="444"), "image/jpeg"
        elif fmt == "jpeg420":
            payload, kind = encode_jpeg(img, quality=85, subsampling="420"), "image/jpeg"
        elif fmt == "jpeg_prog":  # progressive SOF2, 4:2:0
            payload, kind = (
                encode_jpeg(img, quality=85, subsampling="420", progressive=True),
                "image/jpeg",
            )
        else:  # grayscale JPEG (1-component scan)
            payload, kind = encode_jpeg(img[:, :, 0], quality=85), "image/jpeg"
        rows.append((doc_id, f"media://enc/{i}", payload, kind, w, h))
    return rows


def encoded_media_table(spark, n: int = 12) -> DataFrame:
    """The :func:`encoded_media_rows` corpus as a DataFrame (MEDIA_SCHEMA)."""
    return spark.createDataFrame(encoded_media_rows(n), MEDIA_SCHEMA)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy (REAL, not a stub — no codec
    needed): output pixel (r, c) samples input pixel
    (floor(r*H/out_h), floor(c*W/out_w))."""
    h, w = img.shape[0], img.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows[:, None], cols[None, :]]


def resize_images(
    media_df: DataFrame, out_w: int = 64, out_h: int = 36,
    fake_decode: bool = True,
) -> DataFrame:
    """decode -> nearest-neighbor resize -> per-channel features of the
    thumbnail, Arrow-batched. The resize itself is real numpy; only the
    codec slot is stubbed (no PIL/ffmpeg in this container)."""
    schema = (
        "doc_id long, out_w int, out_h int, mean_r double, mean_g double, "
        "mean_b double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-array zip, not iterrows: no per-row Series construction
            rows = []
            for doc_id, payload, width, height in zip(
                pdf["doc_id"].to_numpy(), pdf["payload"],
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
            ):
                img = decode_image_stub(
                    bytes(payload), int(width), int(height), fake=fake_decode
                )
                thumb = resize_nearest(img, out_w, out_h).astype(np.float64)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "out_w": out_w, "out_h": out_h,
                        "mean_r": float(thumb[:, :, 0].mean()),
                        "mean_g": float(thumb[:, :, 1].mean()),
                        "mean_b": float(thumb[:, :, 2].mean()),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["doc_id", "out_w", "out_h", "mean_r", "mean_g", "mean_b"]
            )

    # opaque-kernel column pruning (guide §4): Spark cannot see which
    # columns the kernel reads, so project explicitly before the Arrow
    # crossing (media_ref/media_kind never cross)
    return media_df.select("doc_id", "payload", "width", "height").mapInPandas(kernel, schema)


def decode_video_stub(
    payload: bytes, n_frames: int, width: int, height: int, fake: bool = False
) -> np.ndarray:
    """Video codec slot: (n_frames, h, w, 3) uint8. Real path: Motion-JPEG
    AVI through the from-scratch RIFF parser + JPEG decoder
    (functions/avi.py); the metadata hints are ignored — the container
    carries the truth. Deterministic fake chains the image stub per frame
    (seed = md5(payload || idx)). Compressed codecs (H.264 etc.) raise
    NotImplementedError inside the AVI parser; non-RIFF payloads here."""
    if not fake:
        from geojson_vt_cpp_spark.functions.avi import RIFF_MAGIC, decode_avi_mjpeg

        if payload[:4] == RIFF_MAGIC and payload[8:12] == b"AVI ":
            return decode_avi_mjpeg(payload)
        raise NotImplementedError(
            "non-AVI video decode requires a codec library not present in "
            "this environment; pass fake=True for the deterministic test "
            "double"
        )
    frames = [
        decode_image_stub(
            hashlib.md5(payload + idx.to_bytes(4, "big")).digest(),
            width, height, fake=True,
        )
        for idx in range(n_frames)
    ]
    return np.stack(frames)


ENCODED_VIDEO_BASE_ID = 2000  # real-encoded video ids sit above the fakes
VIDEO_SCHEMA = (
    "doc_id long, media_ref string, payload binary, media_kind string, "
    "width int, height int, n_frames int"
)


def encoded_video_rows(n: int = 6) -> list[tuple]:
    """Deterministic REAL-encoded video corpus: row i is a small Motion-
    JPEG AVI (functions/avi.py) of hash-seeded frames, so the driver-
    oracled ``mm_video_frames`` exercises the real RIFF-parse + JPEG-
    decode path end to end. Shared verbatim by the Spark query and its
    literal oracle (golden_oracle._mm_video_expected_rows): both sides
    run the same deterministic encode, so sampled-frame features agree
    bit-for-bit. Returns VIDEO_SCHEMA-shaped tuples."""
    from geojson_vt_cpp_spark.functions.avi import encode_avi_mjpeg

    rows = []
    for i in range(n):
        doc_id = ENCODED_VIDEO_BASE_ID + i
        w = 24 + (i % 3) * 8
        h = 16 + (i % 2) * 8
        nf = 3 + (i % 4)
        frames = [
            decode_image_stub(
                hashlib.md5(f"avi-{i}-{k}".encode()).digest(), w, h, fake=True
            )
            for k in range(nf)
        ]
        payload = encode_avi_mjpeg(frames, fps=10, quality=85)
        rows.append((doc_id, f"media://avi/{i}", payload, "video/avi", w, h, nf))
    return rows


def encoded_video_table(spark, n: int = 6) -> DataFrame:
    """The :func:`encoded_video_rows` corpus as a DataFrame."""
    return spark.createDataFrame(encoded_video_rows(n), VIDEO_SCHEMA)


def synthesize_video_table(docs_df: DataFrame, max_frames: int = 24) -> DataFrame:
    """Deterministic opaque video payloads + typed metadata (small frame
    dims — videos are frame stacks): n_frames/width/height hash-derived."""
    d = F.col("doc_id").cast("string")
    def hcol(tag, mod, add):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(tag), d)), 1, 15), 16, 10)
            .cast("bigint") % mod + add
        ).cast("int")

    return docs_df.select(
        "doc_id",
        F.concat(F.lit("video://"), d).alias("media_ref"),
        F.unhex(F.md5(F.concat(F.lit("video-"), d))).alias("payload"),
        F.lit("video/mp4").alias("media_kind"),
        hcol("vw-", 320, 16).alias("width"),
        hcol("vh-", 180, 16).alias("height"),
        hcol("vf-", max_frames, 2).alias("n_frames"),
    )


def sample_video_frames(
    media_df: DataFrame, every_k: int = 3, fake_decode: bool = True
) -> DataFrame:
    """Frame sampling: decode -> keep every k-th frame -> per-frame mean
    gray. One output row per sampled frame (the batch shape a training
    pipeline feeds to a vision encoder)."""
    schema = "doc_id long, frame_idx int, n_frames int, mean_gray double"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, width, height, n_frames in zip(
                pdf["doc_id"].to_numpy(), pdf["payload"],
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
                pdf["n_frames"].to_numpy(),
            ):
                vid = decode_video_stub(
                    bytes(payload), int(n_frames), int(width), int(height),
                    fake=fake_decode,
                )
                # the decoded stack is the truth: equals the metadata hint
                # on the fake path, the container's own count on real decode
                n = int(vid.shape[0])
                for idx in range(0, n, every_k):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "n_frames": n,
                            "mean_gray": float(vid[idx].mean()),
                        }
                    )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["doc_id", "frame_idx", "n_frames", "mean_gray"]
            )

    # opaque-kernel column pruning (guide §4): Spark cannot see which
    # columns the kernel reads, so project explicitly before the Arrow
    # crossing (media_ref/media_kind never cross)
    return media_df.select("doc_id", "payload", "width", "height", "n_frames").mapInPandas(kernel, schema)


def synthesize_audio_table(docs_df: DataFrame) -> DataFrame:
    """Deterministic opaque audio payloads + typed metadata (sample rate /
    sample count hash-derived, like the image/video tables)."""
    d = F.col("doc_id").cast("string")

    def hcol(tag, mod, add):
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(tag), d)), 1, 15), 16, 10)
            .cast("bigint") % mod + add
        ).cast("int")

    return docs_df.select(
        "doc_id",
        F.concat(F.lit("audio://"), d).alias("media_ref"),
        F.unhex(F.md5(F.concat(F.lit("audio-"), d))).alias("payload"),
        F.lit("audio/wav").alias("media_kind"),
        hcol("ar-", 36_001, 8_000).alias("sample_rate"),
        hcol("an-", 7_901, 100).alias("n_samples"),
    )


def decode_audio_stub(
    payload: bytes, n_samples: int, sample_rate: int, fake: bool = False
):
    """Audio codec slot: real stdlib-wave decode for RIFF/WAV payloads
    (:mod:`geojson_vt_cpp_spark.functions.wav`); deterministic fake
    (payload-hash-seeded int16 mono) when ``fake=True``; compressed formats
    raise. Returns ((n_frames, n_channels) int16, sample_rate)."""
    from geojson_vt_cpp_spark.functions.wav import WAV_MAGIC, decode_wav

    if not fake:
        if payload[: len(WAV_MAGIC)] == WAV_MAGIC:
            return decode_wav(payload)
        raise NotImplementedError(
            "non-WAV audio decode requires a codec library not present in "
            "this environment; pass fake=True for the deterministic test "
            "double"
        )
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return (
        rng.randint(-32768, 32768, size=(n_samples, 1)).astype(np.int16),
        sample_rate,
    )


def extract_audio_features(media_df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """decode -> waveform features (mean |amplitude|, RMS, zero crossings,
    duration), Arrow-batched — the audio leg of the multimodal pipeline."""
    schema = (
        "doc_id long, sample_rate int, n_samples int, mean_amp double, "
        "rms double, zero_crossings int, duration_sec double"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, rate_meta, n_meta in zip(
                pdf["doc_id"].to_numpy(), pdf["payload"],
                pdf["sample_rate"].to_numpy(), pdf["n_samples"].to_numpy(),
            ):
                samples, rate = decode_audio_stub(
                    bytes(payload), int(n_meta), int(rate_meta), fake=fake_decode
                )
                x = samples.astype(np.float64).mean(axis=1)  # downmix channels
                n = x.shape[0]
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": int(rate),
                        "n_samples": n,
                        "mean_amp": float(np.abs(x).mean()),
                        "rms": float(np.sqrt((x * x).mean())),
                        "zero_crossings": zc,
                        "duration_sec": float(n) / float(rate),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=[
                    "doc_id", "sample_rate", "n_samples", "mean_amp", "rms",
                    "zero_crossings", "duration_sec",
                ]
            )

    # opaque-kernel column pruning (guide §4): Spark cannot see which
    # columns the kernel reads, so project explicitly before the Arrow
    # crossing (media_ref/media_kind never cross)
    return media_df.select("doc_id", "payload", "sample_rate", "n_samples").mapInPandas(kernel, schema)


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
            for doc_id, payload, width, height in zip(
                pdf["doc_id"].to_numpy(), pdf["payload"],
                pdf["width"].to_numpy(), pdf["height"].to_numpy(),
            ):
                img = decode_image_stub(
                    bytes(payload), int(width), int(height), fake=fake_decode
                )
                gray = img.mean(axis=2)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": int(width),
                        "height": int(height),
                        "mean_r": float(img[:, :, 0].mean()),
                        "mean_g": float(img[:, :, 1].mean()),
                        "mean_b": float(img[:, :, 2].mean()),
                        "std_gray": float(gray.std()),
                    }
                )
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=["doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "std_gray"]
            )

    # opaque-kernel column pruning (guide §4): Spark cannot see which
    # columns the kernel reads, so project explicitly before the Arrow
    # crossing (media_ref/media_kind never cross)
    return media_df.select("doc_id", "payload", "width", "height").mapInPandas(kernel, schema)
