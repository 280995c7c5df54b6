"""Pure stdlib+numpy JPEG codec (ITU-T T.81, Huffman): baseline
sequential DCT AND — round 10 — progressive DCT (SOF2, spectral
selection + successive approximation, §G), the majority encoding for
web-crawled JPEGs and therefore the high-frequency multimodal-pipeline
input. Completes the media set (functions/png.py lossless images,
wav.py audio, avi.py video). Arithmetic coding, 12-bit precision, and
hierarchical modes still raise ValueError — the multimodal operator
keeps those on its disclosed fallback path.

Progressive design notes: scans accumulate into per-component
coefficient arrays (DC first/refine with point transform, AC
first/refine with EOBRUN per §G.1.2 — the advance-and-correct
refinement loop follows the published libjpeg jdphuff structure,
which IS the interoperable reading of figure G.7); AC scans are
single-component over the component's own (non-MCU-padded) block
grid; restart markers reset predictions AND the EOB run. The
progressive ENCODER (encode_jpeg_progressive) exists primarily as
the decoder's adversary: both modes quantize identical coefficients,
so progressive decode must be BIT-IDENTICAL to baseline decode of
the same image — pinned in tests across gray/color, 4:4:4/4:2:0,
spectral bands, successive-approximation ladders, EOB runs > 1, and
restart intervals. Its AC tables are flat 8-bit Huffman tables
(every symbol, incl. EOBn, code length 8; the all-ones code stays
reserved per Annex C) — valid, deliberately not size-optimal.

Decoder: marker parse (DQT/DHT/SOF/DRI/SOS), Huffman entropy decode
with byte-unstuffing and restart-marker support, dequantize, 8x8
INTEGER inverse DCT (13-bit fixed point, vectorized over all blocks
of a component at once — see the integer-DCT section below for why
float transforms were banished), generic per-component sampling
factors (4:4:4, 4:2:0, 4:2:2) with nearest-neighbor chroma
upsampling, JFIF YCbCr->RGB. Every arithmetic step is either exact
integer or an elementwise float op, so the output is deterministic
AND machine-independent (tests pin it against a from-first-principles
naive float decoder; cross-decoder agreement is exact up to the
+-1 LSB inherent in DCT rounding — the same tolerance libjpeg
documents for its own integer/float IDCT pairs).

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


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


# --------------------------------------------------------------------------
# Integer DCT/IDCT (round 10). The original float transforms went
# through numpy matmul/einsum, whose reductions dispatch to BLAS/SIMD
# kernels chosen PER MACHINE — the same stream decoded to pixels a few
# ±1-LSB flips apart on a different CPU, which broke the frozen golden
# oracles when the round-10 box changed. The fix is the one libjpeg
# ships for exactly this reason: the Loeffler-Ligtenberg-Moshovytz
# 13-bit fixed-point DCT ("islow", the algorithm of jfdctint.c /
# jidctint.c — public, cited in T.81's bibliography). Every operation
# below is an elementwise int64 add/multiply/shift vectorized over
# blocks — bit-identical on any IEEE machine, no reduction anywhere.
# Coefficient-stream SCALE is unchanged (zz ≈ T.81 DCT / q), so the
# container formats, Huffman layers, and the naive-float-decoder
# cross-check (±1 LSB) are untouched; only rounding details moved,
# and the m07/m08 goldens were regenerated once on the stable basis.

_CONST_BITS = 13
_PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _descale(x: np.ndarray, n: int) -> np.ndarray:
    return (x + (1 << (n - 1))) >> n  # arithmetic shift: round half-up


def _fdct_1d(d: list, shift_out: int, descale_n: int):
    """One islow forward-DCT pass over 8 lanes (each lane an int64
    array over all blocks); jfdctint.c butterfly order verbatim."""
    t0, t7 = d[0] + d[7], d[0] - d[7]
    t1, t6 = d[1] + d[6], d[1] - d[6]
    t2, t5 = d[2] + d[5], d[2] - d[5]
    t3, t4 = d[3] + d[4], d[3] - d[4]
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    out = [None] * 8
    if shift_out:
        out[0] = (t10 + t11) << shift_out
        out[4] = (t10 - t11) << shift_out
    else:
        out[0] = _descale(t10 + t11, descale_n - _CONST_BITS)
        out[4] = _descale(t10 - t11, descale_n - _CONST_BITS)
    z1 = (t12 + t13) * _F_0_541196100
    out[2] = _descale(z1 + t13 * _F_0_765366865, descale_n)
    out[6] = _descale(z1 - t12 * _F_1_847759065, descale_n)
    z1 = t4 + t7
    z2 = t5 + t6
    z3 = t4 + t6
    z4 = t5 + t7
    z5 = (z3 + z4) * _F_1_175875602
    t4 = t4 * _F_0_298631336
    t5 = t5 * _F_2_053119869
    t6 = t6 * _F_3_072711026
    t7 = t7 * _F_1_501321110
    z1 = z1 * -_F_0_899976223
    z2 = z2 * -_F_2_562915447
    z3 = z3 * -_F_1_961570560 + z5
    z4 = z4 * -_F_0_390180644 + z5
    out[7] = _descale(t4 + z1 + z3, descale_n)
    out[5] = _descale(t5 + z2 + z4, descale_n)
    out[3] = _descale(t6 + z2 + z3, descale_n)
    out[1] = _descale(t7 + z1 + z4, descale_n)
    return out


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) level-shifted int samples -> (n, 8, 8) DCT
    coefficients scaled x8 (the jfdctint output scale)."""
    b = blocks.astype(np.int64)
    rows = _fdct_1d(
        [b[:, :, x] for x in range(8)], _PASS1_BITS,
        _CONST_BITS - _PASS1_BITS,
    )
    work = np.stack(rows, axis=2)  # (n, 8row, 8u)
    cols = _fdct_1d(
        [work[:, y, :] for y in range(8)], 0, _CONST_BITS + _PASS1_BITS
    )
    return np.stack(cols, axis=1)  # (n, 8v, 8u)


def _quantize(coef8: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """jcdctmgr islow quantization of x8-scaled coefficients: divide by
    8*q, rounding half away from zero — integer-exact."""
    q8 = qtbl.astype(np.int64) * 8
    a = np.abs(coef8)
    out = (a + (q8 >> 1)) // q8
    return np.where(coef8 < 0, -out, out)


def _idct_1d(d: list, descale_n: int):
    """One islow inverse-DCT pass over 8 lanes; jidctint.c verbatim."""
    z2, z3 = d[2], d[6]
    z1 = (z2 + z3) * _F_0_541196100
    t2 = z1 - z3 * _F_1_847759065
    t3 = z1 + z2 * _F_0_765366865
    z2, z3 = d[0], d[4]
    t0 = (z2 + z3) << _CONST_BITS
    t1 = (z2 - z3) << _CONST_BITS
    t10, t13 = t0 + t3, t0 - t3
    t11, t12 = t1 + t2, t1 - t2
    t0, t1, t2, t3 = d[7], d[5], d[3], d[1]
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * _F_1_175875602
    t0 = t0 * _F_0_298631336
    t1 = t1 * _F_2_053119869
    t2 = t2 * _F_3_072711026
    t3 = t3 * _F_1_501321110
    z1 = z1 * -_F_0_899976223
    z2 = z2 * -_F_2_562915447
    z3 = z3 * -_F_1_961570560 + z5
    z4 = z4 * -_F_0_390180644 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4
    return [
        _descale(t10 + t3, descale_n),
        _descale(t11 + t2, descale_n),
        _descale(t12 + t1, descale_n),
        _descale(t13 + t0, descale_n),
        _descale(t13 - t0, descale_n),
        _descale(t12 - t1, descale_n),
        _descale(t11 - t2, descale_n),
        _descale(t10 - t3, descale_n),
    ]


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


def _quantized_zz_blocks(plane: np.ndarray, qtbl_zz: np.ndarray) -> np.ndarray:
    """Every 8x8 block of an MCU-padded plane -> (n_blocks, 64)
    quantized zigzag coefficients, row-major block order — ONE shared
    integer transform (islow fdct + half-away-from-zero quantize) for
    the baseline and progressive encoders, bit-stable per machine."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.astype(np.int64)
        .reshape(bh, 8, bw, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128
    coef8 = _fdct_blocks(blocks).reshape(-1, 64)[:, _ZIGZAG]
    return _quantize(coef8, qtbl_zz)


def _encode_zz_block(
    w: _BitWriter,
    zz: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-code one pre-quantized zigzag block (the transform runs
    whole-plane vectorized in _quantized_zz_blocks; only the inherently
    sequential Huffman pass stays per-block)."""
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


def _prep_planes(img: np.ndarray, subsampling: str):
    """Shared encoder front half (color transform, chroma subsample,
    MCU padding) — one piece of code so the baseline and progressive
    encoders quantize IDENTICAL samples (the cross-mode decode parity
    pin rests on it). Returns (gray, h, w, sampling, mcux, mcuy,
    padded-planes)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H, W) gray or (H, W, 3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

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
    return gray, h, w, sampling, mcux, mcuy, padded


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
    gray, h, w, sampling, mcux, mcuy, padded = _prep_planes(img, subsampling)
    qlum, qchr = _quality_tables(quality)
    ncomp = len(padded)

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
    # transform + quantize every block of every plane in one vectorized
    # integer pass; the MCU walk below only entropy-codes
    comp_zz = [
        _quantized_zz_blocks(padded[c], qlum if c == 0 else qchr)
        for c in range(ncomp)
    ]
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
            bw = padded[c].shape[1] // 8
            dc, ac = (dc_l, ac_l) if c == 0 else (dc_c, ac_c)
            for by in range(cv):
                for bx in range(ch):
                    idx = (my * cv + by) * bw + (mx * ch + bx)
                    preds[c] = _encode_zz_block(
                        writer, comp_zz[c][idx], dc, ac, preds[c]
                    )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Progressive encoder (T.81 §G.1.2; scan script shaped like libjpeg's
# default: DC first at Al=1, per-component AC bands at Al>0, DC refine,
# then AC successive-approximation refinements down to Al=0). Exists as
# the decoder's adversary: both modes quantize identical coefficients,
# so progressive decode must equal baseline decode bit-for-bit.

# flat AC Huffman table: every symbol 0x00..0xFE at code length 8 (the
# all-ones code 0xFF stays reserved per Annex C) — EOBn symbols for any
# run length are representable, unlike the Annex K baseline tables
_AC_FLAT = ([0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(255)))


class _ProgACState:
    """Per-scan AC entropy state: the EOB run counter plus the
    correction bits buffered inside it (refinement scans)."""

    def __init__(self, w: _BitWriter, ac_codes: dict) -> None:
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, ln = self.ac[n << 4]
            self.w.write(code, ln)
            if n:
                self.w.write(self.eobrun - (1 << n), n)
            for bit in self.pending:
                self.w.write(bit, 1)
            self.eobrun = 0
            self.pending = []


def _encode_dc_prog(w, blocks_zz, order, dc_codes, al, preds, ci, first):
    """One component's DC contribution to an interleaved DC scan MCU
    walk is done by the caller; this encodes ONE block."""
    if first:
        v = int(blocks_zz[0]) >> al  # arithmetic shift (G.1.2.1)
        diff = v - preds[ci]
        preds[ci] = v
        t = _category(diff)
        code, ln = dc_codes[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    else:
        w.write((int(blocks_zz[0]) >> al) & 1, 1)


def _encode_ac_first_block(st: _ProgACState, zz, ss, se, al) -> None:
    w, ac = st.w, st.ac
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        if v < 0:
            t = (-v) >> al
            t2 = ~t  # low bits encode the negative value (F.1.4.1)
        else:
            t = v >> al
            t2 = t
        if t == 0:
            r += 1
            continue
        st.flush_eobrun()
        while r > 15:
            code, ln = ac[0xF0]
            w.write(code, ln)
            r -= 16
        nbits = t.bit_length()
        code, ln = ac[(r << 4) | nbits]
        w.write(code, ln)
        w.write(t2 & ((1 << nbits) - 1), nbits)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _encode_ac_refine_block(st: _ProgACState, zz, ss, se, al) -> None:
    w, ac = st.w, st.ac
    absv = []
    eob = ss - 1  # position of the LAST newly-significant coefficient
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absv.append(t)
        if t == 1:
            eob = k
    r = 0
    br: list[int] = []
    for i, k in enumerate(range(ss, se + 1)):
        t = absv[i]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush_eobrun()
            code, ln = ac[0xF0]
            w.write(code, ln)
            r -= 16
            for bit in br:
                w.write(bit, 1)
            br = []
        if t > 1:  # already significant: just its next magnitude bit
            br.append(t & 1)
            continue
        st.flush_eobrun()
        code, ln = ac[(r << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(zz[k]) >= 0 else 0, 1)
        for bit in br:
            w.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array as PROGRESSIVE JPEG ((H, W) gray or
    (H, W, 3) RGB) with the same quantization as encode_jpeg — by
    construction the decoded pixels equal the baseline decode exactly.
    ``restart_interval`` (in MCUs for the DC scans, blocks for AC
    scans) exercises the decoder's per-scan restart handling."""
    gray, h, w, sampling, mcux, mcuy, padded = _prep_planes(img, subsampling)
    qlum, qchr = _quality_tables(quality)
    ncomp = len(padded)

    # quantized zigzag coefficients for every block, MCU-grid row-major
    # (the exact per-block expression _encode_block uses, so the
    # coefficient arrays match the baseline encoder bit-for-bit)
    comp_zz = []
    for c in range(ncomp):
        qz = qlum if c == 0 else qchr
        plane = padded[c]
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        comp_zz.append((_quantized_zz_blocks(plane, qz), bw, bh))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, tbl in ([(0, qlum)] if gray else [(0, qlum), (1, qchr)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(x) for x in tbl
        )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        ch, cv = sampling[c]
        out += bytes([c + 1, (ch << 4) | cv, 0 if c == 0 else 1])
    huffs = [(0x00, _DC_LUM), (0x10, _AC_FLAT)]
    if not gray:
        huffs += [(0x01, _DC_CHR)]
    for tc_th, (bits, vals) in huffs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if gray:
        script = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0),
        ]
    dc_codes = [
        _build_codes(*(_DC_LUM if c == 0 else _DC_CHR)) for c in range(ncomp)
    ]
    ac_codes = _build_codes(*_AC_FLAT)

    for comps, ss, se, ah, al in script:
        ns = len(comps)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for c in comps:
            td = 0 if c == 0 else 1
            out += bytes([c + 1, (td << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])
        writer = _BitWriter()
        st = _ProgACState(writer, ac_codes)
        preds = [0] * ncomp
        rst = 0
        if ss == 0 and ns >= 1 and (ns > 1 or ncomp == 1):
            # interleaved DC scan over the MCU grid
            for m in range(mcux * mcuy):
                if restart_interval and m and m % restart_interval == 0:
                    st.flush_eobrun()
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    preds = [0] * ncomp
                my, mx = divmod(m, mcux)
                for c in comps:
                    zzs, bw, _bh = comp_zz[c]
                    ch, cv = sampling[c]
                    for by in range(cv):
                        for bx in range(ch):
                            idx = (my * cv + by) * bw + (mx * ch + bx)
                            _encode_dc_prog(
                                writer, zzs[idx], None, dc_codes[c], al,
                                preds, c, ah == 0,
                            )
        else:
            # non-interleaved scan over the component's own block grid
            (c,) = comps
            zzs, bw, _bh = comp_zz[c]
            hmax = max(s[0] for s in sampling)
            vmax = max(s[1] for s in sampling)
            ch, cv = sampling[c]
            cw = (w * ch + hmax - 1) // hmax
            chh = (h * cv + vmax - 1) // vmax
            bw_n, bh_n = (cw + 7) // 8, (chh + 7) // 8
            for u in range(bw_n * bh_n):
                if restart_interval and u and u % restart_interval == 0:
                    st.flush_eobrun()
                    writer.flush()
                    writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    preds = [0] * ncomp
                row, col = divmod(u, bw_n)
                zz = zzs[row * bw + col]
                if ss == 0:
                    _encode_dc_prog(
                        writer, zz, None, dc_codes[c], al, preds, c, ah == 0
                    )
                elif ah == 0:
                    _encode_ac_first_block(st, zz, ss, se, al)
                else:
                    _encode_ac_refine_block(st, zz, ss, se, al)
        st.flush_eobrun()
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized INTEGER coefficient blocks -> (n, 8, 8)
    uint8 samples via the islow integer IDCT (module header): pass 1
    down the columns, pass 2 across the rows, exactly the jidctint.c
    descale points — no float reduction, bit-stable on any machine."""
    c = coefs.astype(np.int64)
    pass1 = _idct_1d(
        [c[:, r, :] for r in range(8)], _CONST_BITS - _PASS1_BITS
    )
    work = np.stack(pass1, axis=1)  # (n, 8 spatial rows, 8 freq cols)
    pass2 = _idct_1d(
        [work[:, :, j] for j in range(8)], _CONST_BITS + _PASS1_BITS + 3
    )
    spatial = np.stack(pass2, axis=2)  # (n, 8, 8)
    return np.clip(spatial + 128, 0, 255).astype(np.uint8)


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


# --------------------------------------------------------------------------
# Progressive decoding (T.81 §G.1.2; the scan-accumulation structure and
# the AC-refinement advance-and-correct loop follow the published libjpeg
# jdphuff.c reading of figure G.7, the interoperable interpretation)


def _init_progressive_components(frame) -> list[dict]:
    """Per-component coefficient state for a SOF2 frame: MCU-padded
    grids like the sequential path (interleaved DC scans walk them),
    plus the NON-interleaved block dims (AC scans walk the component's
    own ceil(size/8) grid — T.81 A.2.2, not the MCU-padded one)."""
    fw, fh, comps = frame
    if fw == 0 or fh == 0:
        raise ValueError("corrupt JPEG: zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    out = []
    for cid, ch, cv, _tq in comps:
        bw, bh = mcux * ch, mcuy * cv
        cw = (fw * ch + hmax - 1) // hmax  # component sample dims
        chh = (fh * cv + vmax - 1) // vmax
        out.append(
            {
                "cid": cid,
                "h": ch,
                "v": cv,
                "coef": np.zeros((bh * bw, 64), dtype=np.int64),
                "bw": bw,
                "bw_n": (cw + 7) // 8,
                "bh_n": (chh + 7) // 8,
                "mcux": mcux,
                "mcuy": mcuy,
            }
        )
    return out


def _decode_progressive_scan(
    reader: _BitReader,
    prog_comps: list[dict],
    scan_comps: list[tuple[int, int, int]],
    htables: dict[int, dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"corrupt JPEG: bad spectral band {ss}..{se}")
    if ss > 0 and len(scan_comps) != 1:
        raise ValueError("corrupt JPEG: interleaved progressive AC scan")
    by_cid = {st["cid"]: st for st in prog_comps}
    in_scan = []
    for cid, td, ta in scan_comps:
        st = by_cid.get(cid)
        if st is None:
            raise ValueError(f"corrupt JPEG: scan names unknown component {cid}")
        dc = htables.get(0x00 | td)
        ac = htables.get(0x10 | ta)
        if ss == 0 and ah == 0 and dc is None:
            raise ValueError(f"corrupt JPEG: undefined DC huffman table {td}")
        if ss > 0 and ac is None:
            raise ValueError(f"corrupt JPEG: undefined AC huffman table {ta}")
        in_scan.append({"st": st, "dc": dc, "ac": ac, "pred": 0})
    state = {"eobrun": 0}
    interleaved = len(in_scan) > 1
    if interleaved:
        mcux, mcuy = in_scan[0]["st"]["mcux"], in_scan[0]["st"]["mcuy"]
        n_units = mcux * mcuy
    else:
        st = in_scan[0]["st"]
        n_units = st["bw_n"] * st["bh_n"]
    rst = 0
    for u in range(n_units):
        if restart_interval and u and u % restart_interval == 0:
            reader.align_and_expect_rst(rst)
            rst += 1
            state["eobrun"] = 0
            for sc in in_scan:
                sc["pred"] = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            for sc in in_scan:
                st = sc["st"]
                for by in range(st["v"]):
                    for bx in range(st["h"]):
                        row = my * st["v"] + by
                        col = mx * st["h"] + bx
                        blk = st["coef"][row * st["bw"] + col]
                        _decode_block_prog(reader, sc, blk, ss, se, ah, al, state)
        else:
            sc = in_scan[0]
            st = sc["st"]
            row, col = divmod(u, st["bw_n"])
            blk = st["coef"][row * st["bw"] + col]
            _decode_block_prog(reader, sc, blk, ss, se, ah, al, state)


def _decode_block_prog(reader, sc, blk, ss, se, ah, al, state) -> None:
    if ss == 0:  # DC scan (se validated == 0 by the band check + spec)
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")
        if ah == 0:  # first: baseline diff decode, point-transformed
            t = _decode_huff(reader, sc["dc"])
            diff = _extend(reader.read_bits(t), t) if t else 0
            sc["pred"] += diff
            blk[0] = sc["pred"] << al
        else:  # refinement: one correction bit
            if reader.read_bit():
                blk[0] = int(blk[0]) | (1 << al)
    elif ah == 0:
        _ac_first_decode(reader, sc["ac"], blk, ss, se, al, state)
    else:
        _ac_refine_decode(reader, sc["ac"], blk, ss, se, al, state)


def _ac_first_decode(reader, ac, blk, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index overflow")
            blk[k] = _extend(reader.read_bits(s), s) << al
            k += 1
        elif r == 15:  # ZRL: 16 zero coefficients
            k += 16
        else:  # EOBn: this block ends, run covers 2^r-1+bits MORE blocks
            eob = 1 << r
            if r:
                eob += reader.read_bits(r)
            state["eobrun"] = eob - 1
            return


def _ac_refine_decode(reader, ac, blk, ss, se, al, state) -> None:
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        # a nonzero-history coefficient consumes one correction bit
        if reader.read_bit() and (int(blk[k]) & p1) == 0:
            blk[k] = int(blk[k]) + (p1 if blk[k] >= 0 else m1)

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(reader, ac)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:  # EOBn: refine the rest of the band below
                    eob = 1 << r
                    if r:
                        eob += reader.read_bits(r)
                    state["eobrun"] = eob
                    break
                # ZRL: advance over 16 zero-HISTORY coefficients
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: refinement scan with s > 1"
                    )
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("corrupt JPEG: refinement overflow")
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        # inside the EOB run every remaining nonzero coefficient of the
        # band still carries a correction bit
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a baseline OR progressive JPEG to (width, height,
    n_components, uint8 array — (H, W) for grayscale, (H, W, 3) RGB
    for color). Raises ValueError on arithmetic/12-bit/hierarchical
    streams and on corrupt data."""
    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad SOI signature)")
    try:
        return _decode_jpeg_inner(data)
    except (struct.error, IndexError):
        raise ValueError("corrupt JPEG: truncated header/marker data") from None


def _next_marker(data: bytes, pos: int) -> int:
    """Skip pad bits / fill bytes after an entropy segment: the next
    0xFF byte NOT followed by a stuffed 0x00 (fill 0xFFs collapse)."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            if data[pos + 1] == 0xFF:
                pos += 1
                continue
            return pos
        pos += 1
    raise ValueError("corrupt JPEG: ran off the end looking for a marker")


def _decode_jpeg_inner(data: bytes) -> tuple[int, int, int, np.ndarray]:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    progressive = False
    restart_interval = 0
    scan_comps = None
    prog_comps = None  # progressive per-component coefficient state

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 seq., SOF2 progressive
            prec, fh, fw, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG: {prec}-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fw, fh, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG mode: SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            pos += seglen
            if not progressive:
                break  # single-scan sequential: decoded below
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            if prog_comps is None:
                prog_comps = _init_progressive_components(frame)
            reader = _BitReader(data, pos)
            try:
                _decode_progressive_scan(
                    reader,
                    prog_comps,
                    scan_comps,
                    htables,
                    ss,
                    se,
                    ah_al >> 4,
                    ah_al & 0xF,
                    restart_interval,
                )
            except _HitMarker as hm:
                raise ValueError(
                    f"corrupt JPEG: marker 0xFF{hm.marker:02x} inside "
                    "progressive scan (truncated)"
                ) from None
            except IndexError:
                raise ValueError(
                    "corrupt JPEG: truncated progressive scan"
                ) from None
            pos = _next_marker(data, reader.pos)
            continue
        pos += seglen

    if progressive:
        if prog_comps is None:
            raise ValueError("corrupt JPEG: progressive frame with no scan")
        fw, fh, comps = frame
        comp_info = []
        for (cid, ch, cv, tq), st in zip(comps, prog_comps):
            if tq not in qtables:
                raise ValueError(f"corrupt JPEG: undefined quant table {tq}")
            comp_info.append(
                {"h": ch, "v": cv, "q": qtables[tq],
                 "coef": st["coef"], "bw": st["bw"]}
            )
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        return _finish_decode(fw, fh, comp_info, hmax, vmax)

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

    return _finish_decode(fw, fh, comp_info, hmax, vmax)


def _finish_decode(
    fw: int, fh: int, comp_info: list[dict], hmax: int, vmax: int
) -> tuple[int, int, int, np.ndarray]:
    """Dequantize, IDCT, upsample, color-convert — shared verbatim by
    the sequential and progressive paths (identical coefficient arrays
    MUST produce identical pixels; the cross-mode parity tests rest on
    this tail being one piece of code)."""
    planes = []
    for ci in comp_info:
        deq = np.zeros((len(ci["coef"]), 64), dtype=np.int64)
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
