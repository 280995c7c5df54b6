"""Pure-stdlib PNG codec (zlib + struct + numpy arrays): the REAL
decode kernel for the multimodal plumbing.

The container has no PIL/ffmpeg, but PNG needs neither — the format is
zlib-deflated scanlines behind five byte-predictor filters (RFC 2083 /
ISO 15948 §9). This module implements:

- ``decode_png(data) -> (width, height, channels, pixels)`` for 8-bit,
  non-interlaced grayscale / RGB / gray+alpha / RGBA images (color
  types 0/2/4/6). Palette (type 3), 16-bit depths, and Adam7 interlace
  raise a clear ValueError — those stay on the labeled-fake path in
  operators/multimodal.py, as do JPEG/audio/video.
- ``encode_png(pixels, filter_type)`` — the matching encoder (used by
  the m04 registry entry and tests to synthesize valid PNGs with any
  of the five filters, so every unfilter branch is value-verified
  against the DuckDB oracle).

Scale: decode is inherently per-item work; it runs inside the Arrow
``mapInPandas`` kernel (operators/multimodal.py) so the distribution,
batching, and column pruning around it are Spark-native. Filters
None/Up unfilter vectorized (numpy row ops); Sub/Average/Paeth are
sequential in x by definition (each byte depends on the reconstructed
left neighbor) and loop per scanline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (RFC 2083 §6.6): nearest of left/up/upleft
    to the linear estimate a + b - c, ties broken left, up, upleft."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Encode a uint8 array (H,W) or (H,W,C) as a valid PNG, applying
    ``filter_type`` (0..4) to every scanline."""
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c
    rows = arr.reshape(h, w * c).astype(np.int16)
    zero = np.zeros(w * c, dtype=np.int16)
    filtered = bytearray()
    for y in range(h):
        cur = rows[y]
        up = rows[y - 1] if y else zero
        filtered.append(filter_type)
        if filter_type == 0:
            out = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate((zero[:bpp], cur[:-bpp]))
            out = cur - left
        elif filter_type == 2:  # Up
            out = cur - up
        elif filter_type == 3:  # Average
            left = np.concatenate((zero[:bpp], cur[:-bpp]))
            out = cur - (left + up) // 2
        else:  # Paeth
            left = np.concatenate((zero[:bpp], cur[:-bpp]))
            upleft = np.concatenate((zero[:bpp], up[:-bpp]))
            pred = np.fromiter(
                (
                    _paeth(int(a), int(b), int(cc))
                    for a, b, cc in zip(left, up, upleft)
                ),
                dtype=np.int16,
                count=w * c,
            )
            out = cur - pred
        filtered.extend((out & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG to (width, height, channels, uint8 array (H,W,C)).
    8-bit non-interlaced color types 0/2/4/6 only — palette, 16-bit and
    Adam7 raise ValueError (the multimodal operator keeps those on its
    disclosed fake path)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type="
            f"{color_type}, interlace={interlace}): this stdlib decoder "
            "handles 8-bit non-interlaced gray/RGB/gray-alpha/RGBA only"
        )
    channels = _CHANNELS[color_type]
    stride = width * channels
    bpp = channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"corrupt PNG: {len(raw)} decompressed bytes, expected "
            f"{height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        if ft == 0:
            out[y] = row
        elif ft == 2:  # Up — vectorized: depends only on the prior row
            out[y] = row + (out[y - 1] if y else 0)
        elif ft in (1, 3, 4):  # left-dependent: sequential in x
            o = out[y]
            prev = out[y - 1]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    up = int(prev[x]) if y else 0
                    pred = (left + up) // 2
                else:
                    up = int(prev[x]) if y else 0
                    upleft = int(prev[x - bpp]) if (y and x >= bpp) else 0
                    pred = _paeth(left, up, upleft)
                o[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: filter type {ft}")
    return width, height, channels, out.reshape(height, width, channels)
