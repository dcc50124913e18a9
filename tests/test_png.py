"""Pure-stdlib PNG codec (functions/png.py) + its multimodal wiring.

The decoder is validated three ways: (1) round-trip through our own
encoder, (2) hand-built IDAT streams exercising every scanline filter
type (the encoder only emits filter 0, so filters 1-4 get dedicated
fixtures), (3) the Spark mapInPandas decode/resize paths on image/png
payloads.
"""

import struct
import zlib

import numpy as np
import pytest

from openapi_to_rdf_spark.functions.png import decode_png, encode_png


def _rand_img(h, w, ch, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip(ch):
    img = _rand_img(12, 16, ch)
    out, w, h = decode_png(encode_png(img))
    assert (w, h) == (16, 12)
    assert out.shape == (12, 16, ch)
    assert np.array_equal(out, img)


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode with a CHOSEN filter type per scanline (the spec's encoder
    freedom our writer doesn't use) — exercises the decoder's unfilter."""
    h, w, ch = img.shape
    prev = np.zeros(w * ch, dtype=np.uint8)
    lines = []
    for y in range(h):
        raw = img[y].reshape(-1).astype(np.int32)
        ft = ftypes[y % len(ftypes)]
        if ft == 0:
            enc = raw
        elif ft == 1:
            left = np.concatenate([np.zeros(ch, np.int32), raw[:-ch]])
            enc = raw - left
        elif ft == 2:
            enc = raw - prev
        elif ft == 3:
            left = np.concatenate([np.zeros(ch, np.int32), raw[:-ch]])
            enc = raw - ((left + prev.astype(np.int32)) >> 1)
        elif ft == 4:
            enc = np.empty_like(raw)
            for x in range(w * ch):
                a = int(raw[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = raw[x] - pred
        lines.append(bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = raw.astype(np.uint8)

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[ch], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_scanline_filters_decode(ftypes):
    img = _rand_img(10, 7, 3, seed=ftypes[0] + 11)
    out, w, h = decode_png(_png_with_filters(img, ftypes))
    assert np.array_equal(out, img)


def _chunk(ctype, payload):
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload)))


def test_declared_dimension_bomb_refused_before_inflate():
    """A few-hundred-byte PNG declaring 100000x100000 RGBA must raise on
    the declared size — BEFORE any decompression happens (ADVICE r3)."""
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 6, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        decode_png(data)


def test_idat_overrun_bomb_refused():
    """IDAT that inflates to MORE than the declared (small) dimensions is
    refused without materializing the excess (decompression bomb)."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # 4x4 grey = 20 B
    bomb = zlib.compress(b"\x00" * 10_000_000)           # ~10 KB compressed
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflates past declared"):
        decode_png(data)


def test_idat_underrun_still_mismatch():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(data)


def test_multiple_idat_chunks():
    img = _rand_img(6, 6, 3)
    data = encode_png(img)
    # split the single IDAT into two chunks
    sig, rest = data[:8], data[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos:pos + 4])
        chunks.append((rest[pos + 4:pos + 8], rest[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    out = sig

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    for ctype, payload in chunks:
        if ctype == b"IDAT":
            half = len(payload) // 2
            out += chunk(b"IDAT", payload[:half])
            out += chunk(b"IDAT", payload[half:])
        else:
            out += chunk(ctype, payload)
    dec, w, h = decode_png(out)
    assert np.array_equal(dec, img)


def test_unsupported_features_raise():
    img = _rand_img(4, 4, 3)
    data = bytearray(encode_png(img))
    assert data[24] == 8  # bit depth byte inside IHDR
    data[24] = 16
    # patch the IHDR crc so only the depth check can fire
    ihdr = bytes(data[12:16]) + bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(ihdr))
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_spark_decode_and_resize_png(spark):
    """image/png media rows flow through the REAL (non-fake) decode and
    resize paths; features must equal the raw-rgb8 path's on identical
    pixel content."""
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.multimodal import (
        RAW_RGB_MIME, decode_image_features, resize_images,
    )

    imgs = {i: _rand_img(12, 16, 3, seed=i) for i in (1, 2, 3)}
    rows = []
    for i, img in imgs.items():
        rows.append((i, "image", bytearray(encode_png(img)),
                     {"mime": "image/png", "source_len": 0,
                      "width": None, "height": None}))
        rows.append((100 + i, "image", bytearray(img.tobytes()),
                     {"mime": RAW_RGB_MIME, "source_len": 0,
                      "width": 16, "height": 12}))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
              "meta struct<mime:string,source_len:long,width:int,height:int>")

    feats = {r["media_id"]: r for r in decode_image_features(media).collect()}
    for i in imgs:
        png_r, raw_r = feats[i], feats[100 + i]
        assert (png_r["width"], png_r["height"]) == (16, 12)
        assert np.allclose(png_r["features"], raw_r["features"])

    rs = {r["media_id"]: r for r in resize_images(media, 8, 6).collect()}
    for i in imgs:
        assert rs[i]["payload_len"] == 8 * 6 * 3
        assert bytes(rs[i]["payload"]) == bytes(rs[100 + i]["payload"])


# ---- BMP codec (functions/bmp.py, VERDICT r3 #9) ----

from openapi_to_rdf_spark.functions.bmp import decode_bmp, encode_bmp  # noqa: E402


@pytest.mark.parametrize("shape", [(5, 7), (12, 16, 3), (3, 3, 3)])
def test_bmp_roundtrip(shape):
    img = _rand_img(*shape) if len(shape) == 3 else \
        np.random.RandomState(9).randint(0, 256, size=shape, dtype=np.uint8)
    out, w, h = decode_bmp(encode_bmp(img))
    assert (w, h) == (shape[1], shape[0])
    want = img if len(shape) == 3 else np.repeat(img[:, :, None], 3, axis=2)
    assert np.array_equal(out, want)


def test_bmp_row_padding_and_orientation():
    """Width 3 (stride 9 -> padded to 12) with a distinct top row proves
    bottom-up storage is un-flipped and padding bytes are dropped."""
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    img[0, :, 0] = 255          # top row pure red
    out, w, h = decode_bmp(encode_bmp(img))
    assert np.array_equal(out, img)


def test_bmp_dimension_bomb_refused():
    data = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    import struct as _s
    data[18:26] = _s.pack("<ii", 100_000, 100_000)   # declared dims
    with pytest.raises(ValueError, match="MAX_DECODED_BYTES"):
        decode_bmp(bytes(data))


def test_bmp_truncated_refused():
    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="length mismatch"):
        decode_bmp(good[:-10])


def test_bmp_unsupported_depth_named():
    data = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    data[28] = 8                                     # bit depth field
    with pytest.raises(NotImplementedError, match="bit depth 8"):
        decode_bmp(bytes(data))


def test_bmp_spark_decode_and_resize(spark):
    """The Spark plumbing: image/bmp payloads through decode_image_features
    and resize_images for real (no fake flag)."""
    from openapi_to_rdf_spark.operators.multimodal import (
        decode_image_features, resize_images,
    )

    img = _rand_img(12, 16, 3, seed=21)
    payload = encode_bmp(img)
    rows = [(1, "image", bytearray(payload),
             {"mime": "image/bmp", "width": None, "height": None})]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, "
              "meta struct<mime:string,width:int,height:int>")
    feats = decode_image_features(media).collect()
    assert len(feats) == 1 and feats[0].width == 16 and feats[0].height == 12
    exp = img.astype(np.float64) / 255.0
    np.testing.assert_allclose(feats[0].features[:3], exp.mean(axis=(0, 1)),
                               atol=1e-12)
    rs = resize_images(media, width=8, height=6).collect()
    assert rs[0].payload_len == 8 * 6 * 3
    iy, ix = (np.arange(6) * 12) // 6, (np.arange(8) * 16) // 8
    want = img[iy][:, ix].tobytes()
    assert bytes(rs[0].payload) == want
