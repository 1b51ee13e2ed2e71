"""Motion-JPEG AVI (RIFF) container codec in pure Python.

Completes the multimodal real-decode family (functions/png.py,
functions/jpeg.py, functions/wav.py): an AVI is a RIFF tree —
``RIFF('AVI ' LIST('hdrl' ...) LIST('movi' '00dc'*) 'idx1')`` — whose
``00dc`` chunks each hold one complete baseline-JPEG frame, decoded here
by :func:`geojson_vt_cpp_spark.functions.jpeg.decode_jpeg`. Layout per
the public MS RIFF/AVI spec (AVIMAINHEADER / AVISTREAMHEADER /
BITMAPINFOHEADER); everything little-endian.

Scope guard: only the 'MJPG' fourcc is supported — compressed codecs
(H.264 etc.) raise NotImplementedError loudly, same policy as the other
codecs in this package.
"""

from __future__ import annotations

import struct

import numpy as np

from geojson_vt_cpp_spark.functions.jpeg import decode_jpeg, encode_jpeg

RIFF_MAGIC = b"RIFF"

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: "list[np.ndarray]", fps: int = 10, quality: int = 85
) -> bytes:
    """Encode RGB (h, w, 3) uint8 frames as a Motion-JPEG AVI."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    buf_size = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        buf_size * fps,    # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        _AVIF_HASINDEX,    # dwFlags
        len(jpegs),        # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        buf_size,          # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0,           # dwFlags, wPriority, wLanguage
        0,                 # dwInitialFrames
        1, fps,            # dwScale, dwRate -> rate/scale = fps
        0, len(jpegs),     # dwStart, dwLength
        buf_size,          # dwSuggestedBufferSize
        0xFFFFFFFF,        # dwQuality (default)
        0,                 # dwSampleSize
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    idx, off = [], 4  # offsets relative to the start of 'movi' list data
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for a RIFF chunk run."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("AVI: chunk overruns its parent")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def decode_avi_mjpeg(payload: bytes) -> np.ndarray:
    """Decode a Motion-JPEG AVI into a (n_frames, h, w, 3) uint8 stack."""
    if payload[:4] != RIFF_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    handler = None
    frames: list[np.ndarray] = []
    for fourcc, p, n in _walk_chunks(payload, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = payload[p : p + 4]
        if list_type == b"hdrl":
            for f2, p2, n2 in _walk_chunks(payload, p + 4, p + n):
                if f2 == b"LIST" and payload[p2 : p2 + 4] == b"strl":
                    for f3, p3, n3 in _walk_chunks(payload, p2 + 4, p2 + n2):
                        if f3 == b"strh" and n3 >= 8:
                            if payload[p3 : p3 + 4] == b"vids":
                                handler = payload[p3 + 4 : p3 + 8]
        elif list_type == b"movi":
            if handler is not None and handler not in (b"MJPG", b"mjpg"):
                raise NotImplementedError(
                    f"AVI video codec {handler!r} unsupported: only MJPG "
                    "(Motion-JPEG) decodes in this environment"
                )
            for f2, p2, n2 in _walk_chunks(payload, p + 4, p + n):
                if f2.endswith(b"dc") or f2.endswith(b"db"):
                    img = decode_jpeg(payload[p2 : p2 + n2])
                    if img.shape[2] == 1:
                        img = np.repeat(img, 3, axis=2)
                    frames.append(img)
    if not frames:
        raise ValueError("AVI: no video frames found in movi list")
    shapes = {f.shape for f in frames}
    if len(shapes) != 1:
        raise ValueError(f"AVI: inconsistent frame shapes {shapes}")
    return np.stack(frames)
