"""Pure stdlib+numpy BASELINE JPEG codec (ITU-T T.81 sequential DCT,
Huffman): the real image-decode path for compressed payloads,
completing the media set (functions/png.py lossless images, wav.py
audio, avi.py video). Progressive (SOF2), arithmetic coding, 12-bit
precision, and hierarchical modes raise ValueError — the multimodal
operator keeps those on its disclosed fallback path.

Decoder: marker parse (DQT/DHT/SOF0/DRI/SOS), Huffman entropy decode
with byte-unstuffing and restart-marker support, dequantize, 8x8
inverse DCT (separable orthonormal basis matrix — two 8x8 matmuls per
block, vectorized over all blocks of a component at once), generic
per-component sampling factors (4:4:4, 4:2:0, 4:2:2) with
nearest-neighbor chroma upsampling, JFIF YCbCr->RGB. All rounding is
explicit floor(x+0.5) so the output is deterministic and independently
reproducible (tests pin it against a from-first-principles naive
decoder; cross-decoder agreement is exact up to the +-1 LSB inherent
in float IDCT summation order — the same tolerance libjpeg documents).

Encoder (test-payload generator + the write side of the roundtrip):
grayscale or 4:4:4 color, Annex K quantization tables with the libjpeg
quality scaling, the T.81 Annex K "typical" Huffman tables, optional
restart interval. Encoding is lossy by design; the codec contract is
decode(encode(x)) deterministic, not identity.

Public-spec citations: ITU-T T.81 (1992) — zigzag Fig. 5, quant tables
Annex K.1, Huffman tables Annex K.3, entropy coding §F; JFIF 1.02 for
the YCbCr matrix. Reference parity: no reference analog (SURVEY §2
Part B — multimodal extension surface).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag scan order (T.81 Fig. 5): zigzag index -> block index
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 quantization tables (luminance, chrominance), zigzag order
_Q_LUM = np.array([
    16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
    26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
    56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
    95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
    103, 99,
])
_Q_CHR = np.array([
    17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K.3 "typical" Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u pi/16)."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT_M = _dct_matrix()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables (zigzag order)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_Q_LUM, _Q_CHR):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Huffman helpers


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
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
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:  # pad with 1-bits (spec convention)
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops AT markers
    (exposes them so the MCU loop can consume RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-read
                raise _HitMarker(nxt)
            else:
                raise _HitMarker(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Discard pad bits, consume the expected RSTn marker."""
        self.nbits = 0
        if (
            self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError(
                f"corrupt JPEG: expected RST{n & 7} at byte {self.pos}"
            )
        self.pos += 2


class _HitMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t received bits to the signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# Encoder


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qtbl_zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    coef = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    zz = _round_half_up(coef.ravel()[_ZIGZAG] / qtbl_zz).astype(np.int64)
    # DC
    diff = int(zz[0]) - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    w.write(code, ln)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = ac_codes[(run << 4) | t]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _pad_plane(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-pad a component plane to bh x bw BLOCKS (8px each)."""
    h, w = plane.shape
    return np.pad(
        plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 75,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Encode a uint8 array as baseline JPEG: (H, W) grayscale or
    (H, W, 3) RGB. ``subsampling``: '444' (chroma full-res) or '420'
    (chroma averaged 2x2, the common camera layout — exercises the
    decoder's multi-block-MCU path)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) gray or (H, W, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchr = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        sampling = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(_round_half_up(p), 0, 255) for p in (y, cb, cr)]
        if subsampling == "420":
            sampling = [(2, 2), (1, 1), (1, 1)]
            # 2x2 mean downsample of the chroma planes (edge-pad odd dims)
            for i in (1, 2):
                p = planes[i]
                ph, pw = (p.shape[0] + 1) & ~1, (p.shape[1] + 1) & ~1
                p = np.pad(
                    p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
                )
                planes[i] = _round_half_up(
                    p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                )
        else:
            sampling = [(1, 1), (1, 1), (1, 1)]

    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_plane(planes[c], mcuy * sampling[c][1], mcux * sampling[c][0])
        for c in range(ncomp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    # DQT (table 0 = lum; table 1 = chr when color)
    for tid, tbl in ([(0, qlum)] if gray else [(0, qlum), (1, qchr)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in tbl
        )
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        ch, cv = sampling[c]
        out += bytes([c + 1, (ch << 4) | cv, 0 if c == 0 else 1])
    # DHT
    huffs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        huffs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l, ac_l = _build_codes(*_DC_LUM), _build_codes(*_AC_LUM)
    dc_c, ac_c = _build_codes(*_DC_CHR), _build_codes(*_AC_CHR)
    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for c in range(ncomp):
            ch, cv = sampling[c]
            qz = qlum if c == 0 else qchr
            dc, ac = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
            for by in range(cv):
                for bx in range(ch):
                    r0 = (my * cv + by) * 8
                    c0 = (mx * ch + bx) * 8
                    preds[c] = _encode_block(
                        writer,
                        padded[c][r0 : r0 + 8, c0 : c0 + 8],
                        qz,
                        dc,
                        ac,
                        preds[c],
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks -> (n, 8, 8) samples
    (level-shifted, rounded half-up, clipped)."""
    spatial = np.einsum("ux,nuv,vy->nxy", _DCT_M, coefs, _DCT_M, optimize=True)
    return np.clip(_round_half_up(spatial + 128.0), 0, 255).astype(np.uint8)


def _decode_scan(
    reader: _BitReader,
    comp_info: list[dict],
    n_mcu: int,
    mcux: int,
    restart_interval: int,
) -> None:
    """Entropy-decode every MCU of the (single, baseline) scan into the
    per-component zigzag coefficient arrays."""
    rst = 0
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst += 1
            for ci in comp_info:
                ci["pred"] = 0
        my, mx = divmod(m, mcux)
        for ci in comp_info:
            for by in range(ci["v"]):
                for bx in range(ci["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = _decode_huff(reader, ci["dc"])
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    ci["pred"] += diff
                    zz[0] = ci["pred"]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(reader, ci["ac"])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    row = my * ci["v"] + by
                    col = mx * ci["h"] + bx
                    ci["coef"][row * ci["bw"] + col] = zz


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline JPEG to (width, height, n_components, uint8
    array — (H, W) for grayscale, (H, W, 3) RGB for color). Raises
    ValueError on progressive/arithmetic/12-bit/hierarchical streams
    and on corrupt data."""
    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad SOI signature)")
    try:
        return _decode_jpeg_inner(data)
    except (struct.error, IndexError):
        raise ValueError("corrupt JPEG: truncated header/marker data") from None


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, int, np.ndarray]:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("unsupported JPEG: 16-bit quant table")
                qtables[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc_th = seg[p]
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htables[tc_th] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both huffman seq.)
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise ValueError(f"unsupported JPEG mode: {kind}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            pos += seglen
            break
        pos += seglen

    if frame is None or scan_comps is None:
        raise ValueError("corrupt JPEG: missing SOF/SOS")
    fw, fh, comps = frame
    if fw == 0 or fh == 0:
        raise ValueError("corrupt JPEG: zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient storage. Validate every table/component
    # reference AT THE LOOKUP SITE (not via a broad KeyError catch at the
    # top: that would also reclassify genuine decoder bugs as "corrupt
    # JPEG" and silently route valid images to decode_batch's fake path)
    comp_info = []
    scan_map = {c: (d, a) for c, d, a in scan_comps}
    for cid, ch, cv, tq in comps:
        if cid not in scan_map:
            raise ValueError(
                f"corrupt JPEG: SOF component {cid} missing from SOS"
            )
        td, ta = scan_map[cid]
        if tq not in qtables:
            raise ValueError(f"corrupt JPEG: undefined quant table {tq}")
        if (0x00 | td) not in htables or (0x10 | ta) not in htables:
            raise ValueError(
                f"corrupt JPEG: undefined huffman table (dc={td}, ac={ta})"
            )
        bw, bh = mcux * ch, mcuy * cv  # blocks across / down
        comp_info.append({
            "h": ch, "v": cv,
            "q": qtables[tq],
            "dc": htables[0x00 | td],
            "ac": htables[0x10 | ta],
            "coef": np.zeros((bh * bw, 64), dtype=np.int64),
            "bw": bw,
            "pred": 0,
        })

    reader = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    rst = 0
    try:
        _decode_scan(reader, comp_info, n_mcu, mcux, restart_interval)
    except _HitMarker as hm:
        raise ValueError(
            f"corrupt JPEG: marker 0xFF{hm.marker:02x} inside entropy data "
            "(truncated scan)"
        ) from None
    except IndexError:
        raise ValueError("corrupt JPEG: truncated entropy data") from None

    planes = []
    for ci in comp_info:
        deq = np.zeros((len(ci["coef"]), 64), dtype=np.float64)
        deq[:, _ZIGZAG] = ci["coef"] * ci["q"]
        blocks = _idct_blocks(deq.reshape(-1, 8, 8))
        bw = ci["bw"]
        bh = len(blocks) // bw
        plane = (
            blocks.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full frame geometry (nearest-neighbor replication)
        ry, rx = vmax // ci["v"], hmax // ci["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return fw, fh, 1, planes[0]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG: {len(planes)} components")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(_round_half_up(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
        axis=-1,
    )
    return fw, fh, 3, rgb
