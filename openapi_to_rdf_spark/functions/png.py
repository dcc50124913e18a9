"""Minimal pure-stdlib PNG codec (VERDICT r2 optional #9).

The container ships no Pillow, so the multimodal operators' compressed-
image paths were honest NotImplementedError stubs. PNG, however, needs
only zlib (stdlib) plus the spec's scanline filters — so this module
implements the one real compressed-image codec path the engine can own
end to end, from the public PNG specification (RFC 2083 / W3C PNG):

- :func:`decode_png`: 8-bit greyscale (color type 0), RGB (2) and RGBA
  (6), all five scanline filters (None/Sub/Up/Average/Paeth), multiple
  IDAT chunks. Interlace, palettes and 16-bit depth raise
  NotImplementedError — stated limits, not silent wrongness.
- :func:`encode_png`: the matching writer (filter 0, one IDAT), used by
  tests and by synth pipelines that want real compressed payloads.

Decoding runs inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.decode_image_features) — per-image numpy work on
the executor, never on the driver. The filter unrolling is vectorized
per scanline; only Sub/Average/Paeth carry a per-pixel data dependency,
computed per scanline in a tight loop over width (the spec's recurrence
is inherently sequential per row).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        yield ctype, data[pos + 8:pos + 8 + length]
        if ctype == b"IEND":
            return
        pos += 12 + length  # len + type + payload + crc


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[np.ndarray, int, int]:
    """PNG bytes -> (uint8 array of shape (h, w, channels), width, height).

    Supports bit depth 8, color types 0/2/6, no interlace — the formats a
    training pipeline's thumbnails actually use; everything else raises
    NotImplementedError naming the unsupported feature.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color} (only greyscale/RGB/RGBA)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG")
            if comp != 0 or filt != 0:
                raise ValueError("invalid compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=y * (stride + 1) + 1)
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:                      # None
            out[y] = row
        elif ftype == 2:                    # Up — vectorized
            out[y] = row + prev
        elif ftype == 1:                    # Sub — per-pixel recurrence
            cur = out[y]
            cur[:bpp] = row[:bpp]
            for x in range(bpp, stride):
                cur[x] = (int(row[x]) + int(cur[x - bpp])) & 0xFF
        elif ftype == 3:                    # Average
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:                    # Paeth
            cur = out[y]
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    img = out.reshape(height, width, channels)
    return img, width, height


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 1|3|4) -> PNG bytes (filter 0)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines, 9))
            + chunk(b"IEND", b""))
