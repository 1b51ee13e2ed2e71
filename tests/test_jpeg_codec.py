"""Baseline JPEG codec (functions/jpeg.py): lossy round trips bounded by
the quantization step, exact invariants a cancelling encoder/decoder bug
pair could not fake, loud errors on unsupported shapes, and the real-decode
Spark path through the multimodal kernel."""

from __future__ import annotations

import numpy as np
import pytest

from geojson_vt_cpp_spark.functions.jpeg import JPEG_SOI, decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(h + w - 2, 1)],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dims", [(40, 56), (33, 47), (8, 8), (9, 13)])
def test_round_trip_gradient(sub, dims):
    h, w = dims
    img = _gradient(h, w)
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    if sub == "444":
        # smooth content at q90: error bounded by the quantization step
        assert err.max() <= 8, err.max()
    else:
        # 4:2:0 replication-upsamples chroma: on a gradient the intrinsic
        # chroma error is ~1.4x the per-pixel slope (steep on tiny images),
        # on TOP of the quantization step — bound accordingly
        slope = 255 // max(min(h, w) - 1, 1)
        assert err.max() <= 16 + 2 * slope, (err.max(), slope)
        assert err.mean() <= 4 + slope / 3, (err.mean(), slope)


def test_solid_color_exact():
    """DCT of a constant block is DC-only; DC survives quantization at any
    quality, so a solid color must reconstruct EXACTLY (a structural
    invariant — a huffman or zigzag bug would corrupt it wildly)."""
    for v in (0, 54, 137, 255):
        img = np.full((24, 40, 3), v, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=75))
        assert int(np.abs(dec.astype(int) - v).max()) == 0, v


def test_grayscale_single_component():
    g = _gradient(32, 24)[:, :, 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == (32, 24, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 6


def test_noise_decodes_all_huffman_paths():
    """Uniform noise at q95 produces long AC runs, ZRL escapes and large
    magnitudes — the decode must survive and stay in range."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(41, 29, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape and dec.dtype == np.uint8


def test_deterministic():
    img = _gradient(24, 24)
    assert encode_jpeg(img, quality=85) == encode_jpeg(img, quality=85)


def test_bad_soi_raises():
    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x00\x01notajpeg")


def test_lossless_sof3_raises_not_implemented():
    """An unsupported SOF marker (lossless SOF3) must raise loudly."""
    enc = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
    i = enc.find(b"\xff\xc0")
    assert i > 0
    enc[i + 1] = 0xC3  # SOF0 -> SOF3
    with pytest.raises(NotImplementedError, match="SOF0/1"):
        decode_jpeg(bytes(enc))


@pytest.mark.parametrize(
    "w,h,sub,gray,q",
    [
        (16, 16, "444", False, 85),
        (24, 16, "420", False, 85),
        (17, 9, "444", False, 40),
        (21, 13, "420", False, 95),
        (33, 17, "420", True, 85),
        (5, 3, "444", False, 85),
    ],
)
def test_progressive_decode_equals_baseline(w, h, sub, gray, q):
    """Progressive (SOF2) and baseline streams of the same image carry the
    SAME quantized coefficients, so the decodes must agree bit-for-bit —
    a sharp oracle over all four progressive scan decoders (DC/AC first at
    Al=1, DC/AC refinement)."""
    import hashlib

    from geojson_vt_cpp_spark.operators.multimodal import decode_image_stub

    img = decode_image_stub(hashlib.md5(f"pr{w}x{h}".encode()).digest(), w, h, fake=True)
    if gray:
        img = img[:, :, 0]
    base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    prog = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_eobn_run_custom_table():
    """EOBn (run > 1) decode path: hand-built SOF2 gray stream, 16x8 (two
    blocks), custom AC huffman table carrying the EOB2 symbol 0x10 that
    Annex K tables lack. DC scan sets both blocks' DC to 8 (qt all-ones),
    AC scan is a single EOB2 covering both blocks -> every pixel exactly
    8/8 + 128 = 129."""
    import struct as _s

    from geojson_vt_cpp_spark.functions.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _canonical_codes,
    )

    class BW:
        def __init__(self):
            self.bits = []

        def put(self, code, length):
            for i in range(length - 1, -1, -1):
                self.bits.append((code >> i) & 1)

        def bytes_(self):
            out = bytearray()
            b = self.bits + [1] * (-len(self.bits) % 8)
            for i in range(0, len(b), 8):
                byte = 0
                for bit in b[i : i + 8]:
                    byte = (byte << 1) | bit
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)
            return bytes(out)

    def seg(marker, payload):
        return _s.pack(">HH", marker, len(payload) + 2) + payload

    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    # custom AC table: 3 symbols at code length 2 — EOB(0x00), EOB2(0x10),
    # (run0,size1)(0x01)
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x00, 0x10, 0x01]
    ac = _canonical_codes(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes([1] * 64))  # qt0: all ones
    out += seg(0xFFC2, _s.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, bytes([0x00] + DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += seg(0xFFC4, bytes([0x10] + ac_bits) + bytes(ac_vals))

    # DC first scan (Ss=0, Se=0, Ah=0, Al=0): diffs 8, 0
    bw = BW()
    code, ln = dc[4]  # size category of diff=8
    bw.put(code, ln)
    bw.put(8, 4)
    code, ln = dc[0]  # diff=0
    bw.put(code, ln)
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    out += bw.bytes_()

    # AC scan (Ss=1, Se=63, Ah=0, Al=0): EOB2 + 1 extension bit (0)
    bw = BW()
    code, ln = ac[0x10]
    bw.put(code, ln)
    bw.put(0, 1)  # eobrun = (1<<1)-1 + 0 = 1 -> covers this and next block
    out += seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
    out += bw.bytes_()
    out += b"\xff\xd9"

    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 16, 1)
    assert (img == 129).all()


def test_decode_image_stub_dispatch():
    """The multimodal codec slot dispatches PNG vs JPEG on magic bytes and
    normalizes grayscale JPEG to RGB."""
    from geojson_vt_cpp_spark.functions.png import encode_png
    from geojson_vt_cpp_spark.operators.multimodal import decode_image_stub

    img = _gradient(16, 20)
    png = decode_image_stub(encode_png(img), 20, 16)
    assert png.shape == (16, 20, 3) and (png == img).all()
    jpg = decode_image_stub(encode_jpeg(img, quality=90), 20, 16)
    assert jpg.shape == (16, 20, 3)
    gray = decode_image_stub(encode_jpeg(img[:, :, 0], quality=90), 20, 16)
    assert gray.shape == (16, 20, 3)
    assert (gray[:, :, 0] == gray[:, :, 1]).all()
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"GIF89a....", 4, 4)


@pytest.mark.spark
def test_real_decode_spark_kernel(spark):
    """The encoded PNG/JPEG corpus decodes through the REAL paths inside
    the Arrow-batched Spark kernel, matching a local decode of the same
    deterministic corpus."""
    from geojson_vt_cpp_spark.operators.multimodal import (
        decode_image_stub,
        encoded_media_rows,
        encoded_media_table,
        extract_image_features,
    )

    got = {
        r["doc_id"]: (r["mean_r"], r["mean_g"], r["mean_b"], r["std_gray"])
        for r in extract_image_features(
            encoded_media_table(spark), fake_decode=False
        ).collect()
    }
    rows = encoded_media_rows()
    assert len(got) == len(rows)
    n_jpeg = 0
    for (doc_id, _ref, payload, kind, w, h) in rows:
        img = decode_image_stub(bytes(payload), w, h, fake=False)
        gray = img.mean(axis=2)
        want = (
            float(img[:, :, 0].mean()), float(img[:, :, 1].mean()),
            float(img[:, :, 2].mean()), float(gray.std()),
        )
        assert got[doc_id] == want, doc_id
        n_jpeg += kind == "image/jpeg"
    assert n_jpeg >= 6  # the corpus genuinely exercises JPEG rows
