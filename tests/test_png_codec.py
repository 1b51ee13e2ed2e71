"""Pure-numpy PNG codec: round-trips, hand-computed unfilter fixtures,
error paths, and the REAL (non-fake) decode path through the Spark
multimodal kernels."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geojson_vt_cpp_spark.functions.png import (
    PNG_SIGNATURE, decode_png, encode_png,
)


def _rand_img(h, w, ch, seed):
    return np.random.RandomState(seed).randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_round_trip_all_filters(ch):
    """encode_png cycles filter type per scanline (r % 5), so a 10-row
    image exercises None/Sub/Up/Average/Paeth twice each."""
    img = _rand_img(10, 7, ch, seed=ch)
    out = decode_png(encode_png(img))
    assert out.shape == (10, 7, ch)
    assert np.array_equal(out, img)


def test_round_trip_2d_gray():
    img = _rand_img(6, 5, 1, seed=9)[:, :, 0]
    out = decode_png(encode_png(img))
    assert np.array_equal(out[:, :, 0], img)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + ctype + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _gray_png(rows: list[bytes], w: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 0, 0, 0, 0)
    return (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows))) + _chunk(b"IEND", b"")
    )


def test_unfilter_hand_computed():
    """Hand-built scanlines with known filter bytes -> pixels computed by
    hand from the PNG spec recurrences (guards against a sign error that a
    self-consistent encoder/decoder pair would hide)."""
    png = _gray_png(
        [
            bytes([1, 10, 20, 30]),  # Sub:   10, 30, 60
            bytes([2, 1, 2, 3]),     # Up:    11, 32, 63
            bytes([4, 5, 5, 5]),     # Paeth: 16, 37, 68
            bytes([3, 4, 5, 6]),     # Avg:   12, 26, 53
        ],
        w=3,
    )
    out = decode_png(png)[:, :, 0]
    # Average row: 4+floor((0+16)/2)=12; 5+floor((12+37)/2)=29;
    # 6+floor((29+68)/2)=54
    assert out[0].tolist() == [10, 30, 60]
    assert out[1].tolist() == [11, 32, 63]
    assert out[2].tolist() == [16, 37, 68]
    assert out[3].tolist() == [12, 29, 54]


def test_palette_png_decodes_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
    png = (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0, 1, 2])))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (1, 3, 3)
    assert out[0].tolist() == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]


def test_palette_index_out_of_range_is_loud():
    """A malformed palette PNG whose pixel indexes past the PLTE table must
    raise the codec's ValueError, not an opaque numpy IndexError."""
    plte = bytes([255, 0, 0, 0, 255, 0])  # only 2 entries
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
    png = (
        PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(bytes([0, 0, 1, 5])))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index 5 out of range"):
        decode_png(png)


def test_error_paths():
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"GIF89a" + b"\x00" * 20)
    # depth 4 is illegal for truecolor (spec §11.2.2)
    ihdr_bad = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    png_bad = PNG_SIGNATURE + _chunk(b"IHDR", ihdr_bad) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(png_bad)
    # well-formed header but no image data
    ihdr_ok = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    png_noidat = PNG_SIGNATURE + _chunk(b"IHDR", ihdr_ok) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="missing IDAT"):
        decode_png(png_noidat)


def test_decode_image_stub_real_png_normalizes_channels():
    from geojson_vt_cpp_spark.operators.multimodal import decode_image_stub

    rgba = _rand_img(4, 3, 4, seed=1)
    out = decode_image_stub(encode_png(rgba), 3, 4, fake=False)
    assert out.shape == (4, 3, 3) and np.array_equal(out, rgba[:, :, :3])

    gray = _rand_img(4, 3, 1, seed=2)
    out = decode_image_stub(encode_png(gray), 3, 4, fake=False)
    assert out.shape == (4, 3, 3) and np.array_equal(out[:, :, 0], gray[:, :, 0])

    with pytest.raises(NotImplementedError, match="non-PNG/JPEG"):
        decode_image_stub(b"GIF89a-unsupported-format", 3, 4, fake=False)


@pytest.mark.spark
def test_mm_image_features_real_decode(spark):
    """extract_image_features with fake_decode=False over REAL encoded PNG
    payloads: per-channel means must equal numpy computed on the source
    pixels — the multimodal pipeline is end-to-end real for PNG."""
    from geojson_vt_cpp_spark.operators.multimodal import extract_image_features

    imgs = {i: _rand_img(8 + i, 5 + i, 3, seed=100 + i) for i in range(6)}
    rows = [
        (i, f"png://{i}", bytearray(encode_png(img)), "image/png",
         img.shape[1], img.shape[0])
        for i, img in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_ref string, payload binary, media_kind string, "
        "width int, height int",
    )
    got = {
        r["doc_id"]: r
        for r in extract_image_features(media, fake_decode=False).collect()
    }
    assert len(got) == len(imgs)
    for i, img in imgs.items():
        r = got[i]
        assert r["mean_r"] == pytest.approx(float(img[:, :, 0].mean()), abs=1e-12)
        assert r["mean_g"] == pytest.approx(float(img[:, :, 1].mean()), abs=1e-12)
        assert r["mean_b"] == pytest.approx(float(img[:, :, 2].mean()), abs=1e-12)
        assert r["std_gray"] == pytest.approx(float(img.mean(axis=2).std()), abs=1e-12)


def _manual_png(w, h, depth, color_type, scanlines: bytes, plte: bytes | None = None):
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    out = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", _z.compress(scanlines)) + _chunk(b"IEND", b"")


def test_adam7_round_trip_all_shapes():
    # odd dims exercise empty/partial passes; every channel count
    for ch, (h, w) in [(1, (9, 7)), (2, (5, 3)), (3, (8, 8)), (4, (1, 1)), (3, (2, 10))]:
        img = _rand_img(h, w, ch, seed=ch * 100 + h)
        out = decode_png(encode_png(img, interlace=True))
        assert np.array_equal(out, img), (ch, h, w)


def test_16bit_gray_and_rgb_decode_high_byte():
    # 2x2 gray, depth 16, filter 0 per row; samples big-endian
    vals = [[0x1234, 0xFF00], [0x0001, 0xABCD]]
    rows = b""
    for r in vals:
        rows += b"\x00" + b"".join(struct.pack(">H", v) for v in r)
    img = decode_png(_manual_png(2, 2, 16, 0, rows))
    assert img.shape == (2, 2, 1)
    assert img[:, :, 0].tolist() == [[0x12, 0xFF], [0x00, 0xAB]]

    # 1x2 RGB depth 16 with an Up-filtered second row
    row1 = struct.pack(">HHH", 0x0100, 0x0200, 0x0300)
    png = _manual_png(1, 2, 16, 2, b"\x00" + row1 + b"\x02" + b"\x00" * 6)
    img = decode_png(png)
    assert img.shape == (2, 1, 3)
    assert img[0, 0].tolist() == [1, 2, 3] == img[1, 0].tolist()


def test_sub_byte_gray_scaling():
    # 1-bit: 8 pixels in one byte 0b10110001 -> 255 where bit set
    png = _manual_png(8, 1, 1, 0, b"\x00" + bytes([0b10110001]))
    img = decode_png(png)
    assert img[0, :, 0].tolist() == [255, 0, 255, 255, 0, 0, 0, 255]
    # 2-bit: values 0..3 scale to 0/85/170/255
    png = _manual_png(4, 1, 2, 0, b"\x00" + bytes([0b00011011]))
    assert decode_png(png)[0, :, 0].tolist() == [0, 85, 170, 255]
    # 4-bit: 0xF and 0x7 -> 255, 119
    png = _manual_png(2, 1, 4, 0, b"\x00" + bytes([0xF7]))
    assert decode_png(png)[0, :, 0].tolist() == [255, 119]


def test_sub_byte_palette_indexes_unscaled():
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    # 2-bit palette: indexes 3,2,1,0 packed MSB-first
    png = _manual_png(4, 1, 2, 3, b"\x00" + bytes([0b11100100]), plte=plte)
    img = decode_png(png)
    assert img.shape == (1, 4, 3)
    assert img[0].tolist() == [[100, 110, 120], [70, 80, 90], [40, 50, 60], [10, 20, 30]]
