"""Pure-numpy baseline JPEG (JFIF) codec — public ITU T.81 spec from
scratch, no libjpeg/PIL in this environment.

Gives the multimodal decode slot (:mod:`operators.multimodal`) a REAL path
for the dominant web-image format, alongside the PNG codec
(:mod:`functions.png`). Supported: baseline sequential DCT (SOF0/1) AND
progressive DCT (SOF2 — spectral selection + successive approximation,
EOBn runs, all four scan kinds), 8-bit, 1 component (grayscale) or 3
components (YCbCr) at 4:4:4, 4:2:2 or 4:2:0 subsampling, restart markers.
Not supported (raise ``NotImplementedError``): arithmetic coding, 12-bit,
CMYK — documented loudly rather than silently mis-decoded.

``encode_jpeg`` exists for fixtures/round-trip tests: baseline or
progressive (DC-first/AC-first at Al=1, then DC/AC refinement — all four
scan decoders exercised), 4:4:4 or 4:2:0, Annex K quantization tables
scaled by the libjpeg quality formula, Annex K huffman tables. The decoder
is exercised against encoder output (lossy round-trip bounded by the
quantization step) plus structural invariants a cancelling encoder/decoder
bug pair could not fake (solid color reconstructs exactly; marker layout
is checked field by field; progressive decode must equal baseline decode
BIT-FOR-BIT, since both reconstruct the same quantized coefficients).

Quantization/huffman tables: ITU T.81 Annex K (public spec constants).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# ITU T.81 Annex K quantization tables (K.1 luminance, K.2 chrominance)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K huffman table specs: (bits[1..16] counts, symbol values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward F = D @ B @ D.T, inverse
# B = D.T @ F @ D
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _D[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical huffman assignment
    (T.81 Annex C)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the bit-at-a-time decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public IJG formula)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H8, W8) float plane -> (n_blocks_y, n_blocks_x, 64) quantized
    zigzag coefficients (vectorized over blocks)."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,ncxy,vy->ncuv", _D, blocks, _D)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(by, bx, 64)[:, :, ZIGZAG]


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> JFIF bytes.

    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2 box-mean
    chroma) — the decoder handles both, so round-trip tests cover the
    multi-block MCU path. ``progressive`` emits SOF2 with a
    spectral-selection + successive-approximation scan script (DC first
    Al=1 → AC first per component Al=1 → DC refine → AC refine), which
    reconstructs the IDENTICAL quantized coefficients as the baseline
    stream — the round-trip test asserts bit-equality of the decodes.
    """
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    if gray:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = _scale_qt(QT_LUMA, quality)
    qt_c = _scale_qt(QT_CHROMA, quality)

    if gray:
        comps = [(1, 1, 1, 0)]  # (comp_id, hi, vi, qt_idx)
        planes = [img[:, :, 0]]
    else:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "444":
            comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
        elif subsampling == "420":
            comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
            # pad to even dims before the 2x2 chroma box mean
            he, we = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            p = np.pad(ycc, ((0, he - h), (0, we - w), (0, 0)), mode="edge")
            cb = p[:, :, 1].reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr = p[:, :, 2].reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes = [ycc[:, :, 0], cb, cr]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # quantized zigzag blocks per component, padded to the MCU grid
    qblocks = []
    for (cid, hi, vi, qi), plane in zip(comps, planes):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        pl = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        qblocks.append(_fdct_quant(pl, qt_l if qi == 0 else qt_c))

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
               _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
               _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + qt_l.flatten()[ZIGZAG].astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xFFDB, b"\x01" + qt_c.flatten()[ZIGZAG].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for (cid, hi, vi, qi) in comps:
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, qi)
    out += seg(0xFFC2 if progressive else 0xFFC0, sof)
    for tc_th, bits, vals in (
        ((0 << 4) | 0, DC_LUMA_BITS, DC_LUMA_VALS),
        ((1 << 4) | 0, AC_LUMA_BITS, AC_LUMA_VALS),
        ((0 << 4) | 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        ((1 << 4) | 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        if gray and (tc_th & 0x0F) == 1:
            continue
        out += seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))

    def sos_seg(scan_comps: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        sos = bytes([len(scan_comps)])
        for ci in scan_comps:
            t = min(comps[ci][3], 1)
            sos += bytes([comps[ci][0], (t << 4) | t])
        return seg(0xFFDA, sos + bytes([ss, se, (ah << 4) | al]))

    def comp_grid(ci: int) -> tuple[int, int]:
        """Non-interleaved block grid (true component dims, not the
        MCU-padded store) — must match the decoder's walk."""
        _cid, hi, vi, _qi = comps[ci]
        return (
            (h * vi + 8 * vmax - 1) // (8 * vmax),
            (w * hi + 8 * hmax - 1) // (8 * hmax),
        )

    if not progressive:
        bw = _BitWriter()
        _encode_baseline_scan(bw, qblocks, comps, mcux, mcuy, dc_tabs, ac_tabs)
        bw.flush()
        out += sos_seg(list(range(len(comps))), 0, 63, 0, 0)
        out += bw.out
    else:
        all_cis = list(range(len(comps)))
        scans: list[tuple] = [("dc_first", all_cis, 1)]
        for ci in all_cis:
            scans.append(("ac_first", ci, 1))
        scans.append(("dc_refine", all_cis, 0))
        for ci in all_cis:
            scans.append(("ac_refine", ci, 0))
        for kind, who, al in scans:
            bw = _BitWriter()
            if kind == "dc_first":
                _encode_dc_first_scan(bw, qblocks, comps, mcux, mcuy, dc_tabs, al)
                out += sos_seg(who, 0, 0, 0, al)
            elif kind == "dc_refine":
                _encode_dc_refine_scan(bw, qblocks, comps, mcux, mcuy, al)
                out += sos_seg(who, 0, 0, al + 1, al)
            else:
                ch_, cw_ = comp_grid(who)
                blocks = [
                    qblocks[who][bri, bci]
                    for bri in range(ch_)
                    for bci in range(cw_)
                ]
                tac = ac_tabs[min(comps[who][3], 1)]
                if kind == "ac_first":
                    _encode_ac_first_scan(bw, blocks, tac, 1, 63, al)
                    out += sos_seg([who], 1, 63, 0, al)
                else:
                    _encode_ac_refine_scan(bw, blocks, tac, 1, 63, al)
                    out += sos_seg([who], 1, 63, al + 1, al)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_baseline_scan(bw, qblocks, comps, mcux, mcuy, dc_tabs, ac_tabs):
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, hi, vi, qi) in enumerate(comps):
                tdc, tac = dc_tabs[min(qi, 1)], ac_tabs[min(qi, 1)]
                for byi in range(vi):
                    for bxi in range(hi):
                        zz = qblocks[ci][my * vi + byi, mx * hi + bxi]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _magnitude(diff)
                        code, length = tdc[size]
                        bw.write(code, length)
                        if size:
                            bw.write(bits, size)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = tac[0xF0]  # ZRL
                                bw.write(code, length)
                                run -= 16
                            size, bits = _magnitude(v)
                            code, length = tac[(run << 4) | size]
                            bw.write(code, length)
                            bw.write(bits, size)
                            run = 0
                        if run:
                            code, length = tac[0x00]  # EOB
                            bw.write(code, length)


def _interleaved_blocks(qblocks, comps, mcux, mcuy):
    """Yield (ci, zz) in the interleaved MCU order DC scans use."""
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_cid, hi, vi, _qi) in enumerate(comps):
                for byi in range(vi):
                    for bxi in range(hi):
                        yield ci, qblocks[ci][my * vi + byi, mx * hi + bxi]


def _encode_dc_first_scan(bw, qblocks, comps, mcux, mcuy, dc_tabs, al):
    pred = [0] * len(comps)
    for ci, zz in _interleaved_blocks(qblocks, comps, mcux, mcuy):
        tdc = dc_tabs[min(comps[ci][3], 1)]
        v = int(zz[0]) >> al  # arithmetic shift per T.81 G.1.2.1
        diff = v - pred[ci]
        pred[ci] = v
        size, bits = _magnitude(diff)
        code, length = tdc[size]
        bw.write(code, length)
        if size:
            bw.write(bits, size)


def _encode_dc_refine_scan(bw, qblocks, comps, mcux, mcuy, al):
    for _ci, zz in _interleaved_blocks(qblocks, comps, mcux, mcuy):
        bw.write((int(zz[0]) >> al) & 1, 1)


def _emit_eob_symbol(bw, tac, eobrun: int) -> None:
    """NOTE: the Annex K AC tables carry only EOB (0x00), not the EOBn
    run symbols (0x10..0xE0) custom progressive tables define — so the
    encoder flushes per block (eobrun == 1 always) and stays within the
    fixed tables. The decoder handles full EOBn runs (tested against a
    hand-built custom-DHT stream)."""
    nbits = eobrun.bit_length() - 1
    code, length = tac[nbits << 4]
    bw.write(code, length)
    if nbits:
        bw.write(eobrun - (1 << nbits), nbits)


def _encode_ac_first_scan(bw, blocks, tac, ss, se, al):
    """AC first scan: magnitudes shifted right by Al (T.81 G.1.2.2),
    EOB runs across all-zero bands."""
    eobrun = 0
    for zz in blocks:
        vals = []
        for k in range(ss, se + 1):
            v = int(zz[k])
            a = abs(v) >> al
            vals.append(a if v >= 0 else -a)
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            _emit_eob_symbol(bw, tac, eobrun)  # per-block flush (Annex K)
            eobrun = 0
            continue
        if eobrun:
            _emit_eob_symbol(bw, tac, eobrun)
            eobrun = 0
        run = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = tac[0xF0]
                bw.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = tac[(run << 4) | size]
            bw.write(code, length)
            bw.write(bits, size)
            run = 0
        if last < se - ss:  # trailing zeros -> EOB, flushed per block
            _emit_eob_symbol(bw, tac, 1)
    if eobrun:
        _emit_eob_symbol(bw, tac, eobrun)


def _encode_ac_refine_scan(bw, blocks, tac, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3, libjpeg-equivalent semantics):
    newly-nonzero coefficients (shifted magnitude == 1) emit (run, 1) +
    sign; already-nonzero ones emit positional correction bits, which the
    decoder reads interleaved during its run walk; all-zero tails join a
    buffered EOB run whose correction bits flush after the EOB symbol."""
    eobrun = 0
    bebits: list[int] = []

    def flush_eob():
        nonlocal eobrun, bebits
        if eobrun:
            _emit_eob_symbol(bw, tac, eobrun)
            eobrun = 0
        for b in bebits:
            bw.write(b, 1)
        bebits = []

    for zz in blocks:
        band = [int(zz[k]) for k in range(ss, se + 1)]
        a = [abs(v) >> al for v in band]
        newly = [i for i, ai in enumerate(a) if ai == 1]
        if not newly:
            eobrun += 1
            bebits.extend(ai & 1 for ai in a if ai > 1)
            flush_eob()  # per-block flush (Annex K tables lack EOBn)
            continue
        flush_eob()
        i = 0
        for j in newly:
            zeros = [idx for idx in range(i, j) if a[idx] == 0]
            r = len(zeros)
            seg_start = i
            while r > 15:
                z16 = zeros[15]
                code, length = tac[0xF0]
                bw.write(code, length)
                for idx in range(seg_start, z16 + 1):
                    if a[idx] > 1:
                        bw.write(a[idx] & 1, 1)
                seg_start = z16 + 1
                zeros = zeros[16:]
                r -= 16
            code, length = tac[(r << 4) | 1]
            bw.write(code, length)
            bw.write(1 if band[j] >= 0 else 0, 1)
            for idx in range(seg_start, j):
                if a[idx] > 1:
                    bw.write(a[idx] & 1, 1)
            i = j + 1
        tail = newly[-1] + 1
        if tail <= se - ss:  # anything after the last new coef -> EOB
            eobrun += 1
            bebits.extend(a[idx] & 1 for idx in range(tail, len(a)) if a[idx] > 1)
            flush_eob()  # per-block flush (Annex K tables lack EOBn)
    if eobrun or bebits:
        flush_eob()


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_huffman(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code not found")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _destuff(data: bytes, pos: int) -> tuple[bytes, list[int], int]:
    """De-stuff one entropy-coded segment starting at ``pos``. Returns
    (ecs bytes, bit offsets just after each RST marker, position of the
    terminating marker's 0xFF)."""
    ecs = bytearray()
    rst_resets: list[int] = []
    p = pos
    while p < len(data) - 1:
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:
                ecs.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                rst_resets.append(len(ecs) * 8)
                p += 2
                continue
            break  # next real marker
        ecs.append(b)
        p += 1
    return bytes(ecs), rst_resets, p


class _ScanDecoder:
    """Decodes one entropy-coded scan into the zigzag coefficient store.

    Handles all four progressive scan kinds (T.81 §G.2, the successive-
    approximation control mirrors the public libjpeg phuff semantics) plus
    the baseline full-band scan as the Ss=0/Se=63/Ah=Al=0 special case.
    """

    def __init__(self, br: _BitReader, dc_trees, ac_trees):
        self.br = br
        self.dc_trees = dc_trees
        self.ac_trees = ac_trees
        self.eobrun = 0

    def baseline_block(self, zz: np.ndarray, ci: int, pred: list, td: int, ta: int):
        br = self.br
        size = _read_huffman(br, self.dc_trees[td])
        diff = _extend(br.bits(size), size) if size else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _read_huffman(br, self.ac_trees[ta])
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            s = rs & 0x0F
            if k > 63:
                raise ValueError("invalid JPEG: AC index overflow")
            zz[k] = _extend(br.bits(s), s)
            k += 1

    def dc_first(self, zz: np.ndarray, ci: int, pred: list, td: int, al: int):
        br = self.br
        size = _read_huffman(br, self.dc_trees[td])
        diff = _extend(br.bits(size), size) if size else 0
        pred[ci] += diff
        zz[0] = pred[ci] << al

    def dc_refine(self, zz: np.ndarray, al: int):
        if self.br.bit():
            zz[0] = int(zz[0]) | (1 << al)

    def ac_first(self, zz: np.ndarray, ta: int, ss: int, se: int, al: int):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        br = self.br
        k = ss
        while k <= se:
            rs = _read_huffman(br, self.ac_trees[ta])
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += br.bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("invalid JPEG: AC index overflow")
            zz[k] = _extend(br.bits(s), s) << al
            k += 1

    def ac_refine(self, zz: np.ndarray, ta: int, ss: int, se: int, al: int):
        br = self.br
        p1 = 1 << al
        m1 = -(1 << al)
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _read_huffman(br, self.ac_trees[ta])
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "invalid JPEG: AC refinement size must be 1"
                        )
                    newval = p1 if br.bit() else m1
                else:
                    if r != 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += br.bits(r)
                        break  # fall through to the EOB-run correction walk
                    # r == 15: ZRL — skip 16 zero-history positions
                while k <= se:
                    v = int(zz[k])
                    if v != 0:
                        if br.bit() and (v & p1) == 0:
                            zz[k] = v + (p1 if v >= 0 else m1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if self.eobrun > 0:
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if br.bit() and (v & p1) == 0:
                        zz[k] = v + (p1 if v >= 0 else m1)
                k += 1
            self.eobrun -= 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes -> (H, W, channels) uint8 (3 for YCbCr, 1 for
    grayscale). Baseline sequential (SOF0/1) and progressive (SOF2) —
    spectral selection + successive approximation, restart markers."""
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}  # ZIGZAG order
    dc_trees: dict[int, dict] = {}
    ac_trees: dict[int, dict] = {}
    comps: list[tuple[int, int, int, int]] = []
    h = w = hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    coef: list[np.ndarray] | None = None  # per comp: (by, bx, 64) zigzag
    saw_scan = False

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: marker expected")
        while pos + 2 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(payload):
                pq, tq = payload[off] >> 4, payload[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables not supported")
                zz = np.frombuffer(payload[off + 1 : off + 65], dtype=np.uint8)
                qts[tq] = zz.astype(np.int32)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(payload):
                tc, th = payload[off] >> 4, payload[off] & 0x0F
                bits = list(payload[off + 1 : off + 17])
                n = sum(bits)
                vals = list(payload[off + 17 : off + 17 + n])
                tree = _decode_tree(bits, vals)
                (ac_trees if tc else dc_trees)[th] = tree
                off += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} not supported")
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coef = [
                np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                for (_cid, hi, vi, _tq) in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if coef is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = payload[0]
            scan = [
                (payload[1 + 2 * i], payload[2 + 2 * i] >> 4,
                 payload[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ah_al = payload[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            ecs, rst_resets, pos = _destuff(data, pos)
            _decode_one_scan(
                coef, comps, scan, ss, se, ah, al, progressive,
                ecs, rst_resets, restart_interval, dc_trees, ac_trees,
                h, w, hmax, vmax, mcux, mcuy,
            )
            saw_scan = True
        # other markers (APPn, COM): skipped
    if coef is None or not saw_scan:
        raise ValueError("invalid JPEG: missing SOF/SOS")

    # dequantize + IDCT (vectorized over all blocks) + upsample + color
    full = []
    for (cid, hi, vi, tq), zzs in zip(comps, coef):
        by, bx = zzs.shape[0], zzs.shape[1]
        blocks = (zzs[:, :, UNZIGZAG].reshape(by, bx, 8, 8)
                  * qts[tq][UNZIGZAG].reshape(8, 8)).astype(np.float64)
        spatial = np.einsum("ux,nmuv,vy->nmxy", _D, blocks, _D) + 128.0
        pl = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hi != hmax or vi != vmax:
            pl = np.repeat(np.repeat(pl, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[:, :, None]
    rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    return np.round(rgb).clip(0, 255).astype(np.uint8)


def _decode_one_scan(
    coef, comps, scan, ss, se, ah, al, progressive,
    ecs, rst_resets, restart_interval, dc_trees, ac_trees,
    h, w, hmax, vmax, mcux, mcuy,
):
    by_comp = {c[0]: (i, c) for i, c in enumerate(comps)}
    dec = _ScanDecoder(_BitReader(ecs), dc_trees, ac_trees)
    br = dec.br
    rst_iter = iter(rst_resets)
    next_rst = next(rst_iter, None)
    pred = [0] * len(scan)

    def restart():
        nonlocal next_rst
        br.align()
        if next_rst is not None:
            br.pos = next_rst
            next_rst = next(rst_iter, None)
        pred[:] = [0] * len(scan)
        dec.eobrun = 0

    is_dc = ss == 0
    if len(scan) > 1:
        # interleaved MCU order (multi-component scans; AC must be ns==1)
        if not is_dc:
            raise ValueError("invalid JPEG: interleaved AC-band scan")
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                for si, (cid, td, ta) in enumerate(scan):
                    ci, (_cid, hi, vi, _tq) = by_comp[cid]
                    for byi in range(vi):
                        for bxi in range(hi):
                            zz = coef[ci][my * vi + byi, mx * hi + bxi]
                            if not progressive:
                                dec.baseline_block(zz, si, pred, td, ta)
                            elif ah == 0:
                                dec.dc_first(zz, si, pred, td, al)
                            else:
                                dec.dc_refine(zz, al)
    else:
        # non-interleaved: the component's own block grid, row-major
        cid, td, ta = scan[0]
        ci, (_cid, hi, vi, _tq) = by_comp[cid]
        cw = (w * hi + 8 * hmax - 1) // (8 * hmax)
        ch = (h * vi + 8 * vmax - 1) // (8 * vmax)
        unit = 0
        for bri in range(ch):
            for bci in range(cw):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                unit += 1
                zz = coef[ci][bri, bci]
                if not progressive:
                    dec.baseline_block(zz, 0, pred, td, ta)
                elif is_dc:
                    if ah == 0:
                        dec.dc_first(zz, 0, pred, td, al)
                    else:
                        dec.dc_refine(zz, al)
                elif ah == 0:
                    dec.ac_first(zz, ta, ss, se, al)
                else:
                    dec.ac_refine(zz, ta, ss, se, al)
