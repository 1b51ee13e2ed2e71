"""Motion-JPEG AVI container codec (functions/avi.py): round-trip through
the from-scratch RIFF writer/parser + JPEG codec, error paths, and the
decode_video_stub dispatch. Pure Python — no Spark."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from geojson_vt_cpp_spark.functions.avi import (
    RIFF_MAGIC,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from geojson_vt_cpp_spark.operators.multimodal import (
    decode_image_stub,
    decode_video_stub,
)


def _frames(n, w=32, h=24):
    return [
        decode_image_stub(hashlib.md5(f"f{i}".encode()).digest(), w, h, fake=True)
        for i in range(n)
    ]


def test_round_trip_shape_and_error_bound():
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=10, quality=85)
    assert avi[:4] == RIFF_MAGIC and avi[8:12] == b"AVI "
    out = decode_avi_mjpeg(avi)
    assert out.shape == (5, 24, 32, 3) and out.dtype == np.uint8
    for i in range(5):
        err = np.abs(out[i].astype(float) - frames[i].astype(float)).mean()
        assert err < 16  # q85 JPEG on uniform noise

    # riff size field covers the whole body
    (riff_size,) = struct.unpack_from("<I", avi, 4)
    assert 8 + riff_size == len(avi)


def test_flat_frames_decode_exactly():
    # DC-only frames (constant color) survive JPEG losslessly
    frames = [np.full((16, 16, 3), v, dtype=np.uint8) for v in (0, 128, 255)]
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=90))
    for i, v in enumerate((0, 128, 255)):
        assert np.abs(out[i].astype(int) - v).max() <= 2


def test_video_stub_dispatch_real_and_unsupported():
    frames = _frames(4, w=24, h=16)
    avi = encode_avi_mjpeg(frames)
    vid = decode_video_stub(avi, 4, 24, 16, fake=False)
    assert vid.shape == (4, 16, 24, 3)
    # container is the truth even when the metadata hint disagrees
    vid2 = decode_video_stub(avi, 99, 1, 1, fake=False)
    assert vid2.shape == (4, 16, 24, 3)

    with pytest.raises(NotImplementedError, match="non-AVI video decode"):
        decode_video_stub(b"\x00\x01\x02\x03" * 8, 4, 24, 16, fake=False)


def test_non_mjpeg_codec_raises():
    avi = bytearray(encode_avi_mjpeg(_frames(2)))
    i = avi.find(b"MJPG")  # strh fccHandler
    avi[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="only MJPG"):
        decode_avi_mjpeg(bytes(avi))


def test_truncated_and_garbage_payloads_raise():
    avi = encode_avi_mjpeg(_frames(2))
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi_mjpeg(avi[4:])
    with pytest.raises(ValueError):
        decode_avi_mjpeg(avi[: len(avi) // 3])


def test_empty_frame_list_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([])
