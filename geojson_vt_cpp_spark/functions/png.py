"""Pure-numpy PNG codec (stdlib ``zlib`` + the five scanline filters).

Implements the public PNG specification (RFC 2083 / W3C PNG) from scratch —
no PIL/libpng in this environment — so the multimodal decode slot
(:mod:`geojson_vt_cpp_spark.operators.multimodal`) has a REAL path for the
dominant training-data image format. Supported: every legal bit depth
(1/2/4/8/16) and color type — 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA) — both non-interlaced and Adam7-interlaced,
multi-IDAT. Output is always uint8: sub-byte gray samples scale by
255/(2^d−1) per the spec's sample-depth scaling, 16-bit samples keep
their high byte (the standard 16→8 reduction).

``encode_png`` exists for round-trip tests and deliberately cycles the
filter type per scanline (row r uses filter r % 5) so one round-trip
exercises every unfilter path.

Filter math (per PNG spec §6): a = left neighbor (bpp bytes back),
b = above, c = upper-left; all arithmetic mod 256.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: np.ndarray, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. Returns (height, stride) uint8 —
    ``stride`` is the scanline byte width (ceil(width*channels*depth/8));
    ``bpp`` the filter's left-neighbor distance in bytes (min 1).

    None/Sub/Up rows vectorize (Sub is a per-lane cumsum mod 256);
    Average/Paeth need the sequential left-neighbor recurrence, done
    per-pixel in int32 then wrapped.
    """
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for r in range(height):
        ftype = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub: per-lane cumsum (stride is a bpp multiple)
            lanes = line.reshape(stride // bpp, bpp)
            rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride)
        elif ftype == 2:  # Up
            rec = line + prior
        elif ftype == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            p = prior.astype(np.int32)
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = line[x] + ((a + p[x]) >> 1)
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            p = prior.astype(np.int32)
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                b = p[x]
                c = int(prior[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = line[x] + pred
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        prior = (rec & 0xFF).astype(np.uint8)
        out[r] = prior
    return out


# legal (color_type -> bit depths) combos, PNG spec §11.2.2
_LEGAL_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}

# Adam7 pass geometry: (x0, y0, dx, dy), PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _extract_samples(
    flat: np.ndarray, h: int, w: int, ch: int, depth: int, is_palette: bool
) -> np.ndarray:
    """(h, stride) unfiltered bytes -> (h, w, ch) uint8 samples. Sub-byte
    gray scales by 255/(2^d−1); palette indexes pass through unscaled;
    16-bit keeps the high byte (standard 16→8 reduction)."""
    if depth == 8:
        return flat[:, : w * ch].reshape(h, w, ch)
    if depth == 16:
        return flat.reshape(h, w * ch, 2)[:, :, 0].reshape(h, w, ch)
    bits = np.unpackbits(flat, axis=1)[:, : w * depth].reshape(h, w, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    idx = (bits.astype(np.uint16) * weights).sum(axis=2)
    if is_palette:
        return idx.astype(np.uint8)[:, :, None]
    return (idx * 255 // ((1 << depth) - 1)).astype(np.uint8)[:, :, None]


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    width = height = None
    bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette = None
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    if bit_depth not in _LEGAL_DEPTHS[color_type]:
        raise ValueError(
            f"illegal PNG depth {bit_depth} for color type {color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if not idat:
        raise ValueError("not a PNG: missing IDAT")
    ch = _CHANNELS[color_type]
    bpp = max(1, ch * bit_depth // 8)
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    img = np.zeros((height, width, 1 if color_type == 3 else ch), dtype=np.uint8)
    passes = (
        (((0, 0, 1, 1), width, height),)
        if interlace == 0
        else tuple(
            ((x0, y0, dx, dy), (width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
            for (x0, y0, dx, dy) in _ADAM7
        )
    )
    pos = 0
    for (x0, y0, dx, dy), sw, sh in passes:
        if sw <= 0 or sh <= 0:
            continue
        stride = (sw * ch * bit_depth + 7) // 8
        nbytes = sh * (stride + 1)
        if pos + nbytes > raw.size:
            raise ValueError(
                f"PNG data size {raw.size} too small (need {pos + nbytes})"
            )
        flat = _unfilter(raw[pos : pos + nbytes], sh, stride, bpp)
        pos += nbytes
        img[y0::dy, x0::dx] = _extract_samples(
            flat, sh, sw, ch, bit_depth, color_type == 3
        )
    if pos != raw.size:
        raise ValueError(f"PNG data size {raw.size} != expected {pos}")
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE chunk")
        idx_max = int(img[:, :, 0].max()) if img.size else 0
        if idx_max >= len(palette):
            raise ValueError(
                f"palette index {idx_max} out of range "
                f"(PLTE has {len(palette)} entries)"
            )
        img = palette[img[:, :, 0]]
    return img


def _filter_row(line: np.ndarray, prior: np.ndarray, bpp: int, ftype: int) -> np.ndarray:
    cur = line.astype(np.int32)
    left = np.zeros_like(cur)
    left[bpp:] = cur[:-bpp]
    up = prior.astype(np.int32)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left
    elif ftype == 2:
        out = cur - up
    elif ftype == 3:
        out = cur - ((left + up) >> 1)
    else:  # Paeth
        pp = left + up - upleft
        pa, pb, pc = np.abs(pp - left), np.abs(pp - up), np.abs(pp - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = cur - pred
    return (out & 0xFF).astype(np.uint8)


def _filter_image(img: np.ndarray) -> bytearray:
    """Filter one (sub)image's scanlines; row r uses filter r % 5 so a
    round-trip exercises every unfilter path. Prior resets per call (per
    Adam7 pass, per the spec)."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch)
    lines = bytearray()
    prior = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        ftype = r % 5
        lines.append(ftype)
        lines.extend(_filter_row(flat[r], prior, ch, ftype).tobytes())
        prior = flat[r]
    return lines


def encode_png(img: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (8-bit depth); Adam7
    interlaced when ``interlace`` is set."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if interlace:
        lines = bytearray()
        for (x0, y0, dx, dy) in _ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                lines.extend(_filter_image(sub))
    else:
        lines = _filter_image(img)

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
