"""Baseline JPEG codec (functions/jpeg.py): parity against an
INDEPENDENT from-first-principles decoder written here (different
structure everywhere: bit-string parsing, dict walks, per-coefficient
O(64^2) cosine-sum IDCT), plus PSNR floors, variant rejection, restart
markers, and the m07 routing through decode_batch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kmeanwithmapreduce_spark.functions.jpeg import (
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)

# ---------------------------------------------------------------------------
# Independent naive decoder: parses the same baseline subset with a
# completely different implementation shape. Used ONLY as a test oracle.


def _naive_decode(data: bytes):
    assert data[:2] == b"\xff\xd8"
    i = 2
    qt, ht = {}, {}
    frame = sos = None
    dri = 0
    while i < len(data):
        assert data[i] == 0xFF
        m = data[i + 1]
        i += 2
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[i : i + 2])[0]
        seg = data[i + 2 : i + ln]
        if m == 0xDB:
            p = 0
            while p < len(seg):
                qt[seg[p] & 15] = list(seg[p + 1 : p + 65])
                p += 65
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                counts = list(seg[p + 1 : p + 17])
                syms = list(seg[p + 17 : p + 17 + sum(counts)])
                # code strings like "010": a different lookup structure
                table, code, k = {}, 0, 0
                for L in range(1, 17):
                    for _ in range(counts[L - 1]):
                        table[format(code, f"0{L}b")] = syms[k]
                        code += 1
                        k += 1
                    code *= 2
                ht[seg[p]] = table
                p += 17 + sum(counts)
        elif m == 0xC0:
            h, w = struct.unpack(">HH", seg[1:5])
            comps = [
                (seg[6 + 3 * j], seg[7 + 3 * j] >> 4, seg[7 + 3 * j] & 15,
                 seg[8 + 3 * j])
                for j in range(seg[5])
            ]
            frame = (w, h, comps)
        elif m == 0xDD:
            dri = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:
            sos = {seg[1 + 2 * j]: seg[2 + 2 * j] for j in range(seg[0])}
            i += ln
            break
        i += ln
    w, h, comps = frame
    hm = max(c[1] for c in comps)
    vm = max(c[2] for c in comps)
    mcux = -(-w // (8 * hm))
    mcuy = -(-h // (8 * vm))

    # entropy segment -> bit string (un-stuffed, stop at markers)
    def segment_bits(start):
        bits, j = [], start
        while j < len(data):
            b = data[j]
            if b == 0xFF:
                nxt = data[j + 1]
                if nxt == 0x00:
                    bits.append(format(0xFF, "08b"))
                    j += 2
                    continue
                break
            bits.append(format(b, "08b"))
            j += 1
        return "".join(bits), j

    bits, j = segment_bits(i)
    segments = [bits]
    while j < len(data) and 0xD0 <= data[j + 1] <= 0xD7:
        bits, j = segment_bits(j + 2)
        segments.append(bits)

    def huff(table, s, p):
        for L in range(1, 17):
            if s[p : p + L] in table:
                return table[s[p : p + L]], p + L
        raise AssertionError("bad code")

    def recv_extend(s, p, t):
        if t == 0:
            return 0, p
        v = int(s[p : p + t], 2)
        if v < 2 ** (t - 1):
            v -= 2**t - 1
        return v, p + t

    store = {
        cid: np.zeros((mcuy * cv * 8, mcux * ch * 8))
        for cid, ch, cv, _ in comps
    }
    seg_idx, s, p = 0, segments[0], 0
    preds = {cid: 0 for cid, *_ in comps}
    n_per_seg = dri if dri else mcux * mcuy
    for m in range(mcux * mcuy):
        if dri and m and m % n_per_seg == 0:
            seg_idx += 1
            s, p = segments[seg_idx], 0
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, ch, cv, tq in comps:
            for by in range(cv):
                for bx in range(ch):
                    t, p = huff(ht[sos[cid] >> 4], s, p)
                    d, p = recv_extend(s, p, t)
                    preds[cid] += d
                    zz = [0] * 64
                    zz[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs, p = huff(ht[16 + (sos[cid] & 15)], s, p)
                        r, t = rs >> 4, rs & 15
                        if t == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r
                        v, p = recv_extend(s, p, t)
                        zz[k] = v
                        k += 1
                    # naive per-coefficient IDCT (O(64^2) cosine sum)
                    blk = np.zeros((8, 8))
                    for y in range(8):
                        for x in range(8):
                            acc = 0.0
                            for kk in range(64):
                                u, v_ = divmod(int(_ZIGZAG[kk]), 8)
                                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                                cv_ = 1 / np.sqrt(2) if v_ == 0 else 1.0
                                acc += (
                                    0.25 * cu * cv_ * zz[kk] * qt[tq][kk]
                                    * np.cos((2 * y + 1) * u * np.pi / 16)
                                    * np.cos((2 * x + 1) * v_ * np.pi / 16)
                                )
                            blk[y, x] = acc
                    out = np.clip(np.floor(blk + 128.0 + 0.5), 0, 255)
                    r0 = (my * cv + by) * 8
                    c0 = (mx * ch + bx) * 8
                    store[cid][r0 : r0 + 8, c0 : c0 + 8] = out
    planes = []
    for cid, ch, cv, _ in comps:
        pl = store[cid]
        pl = np.repeat(np.repeat(pl, vm // cv, axis=0), hm // ch, axis=1)
        planes.append(pl[:h, :w])
    if len(planes) == 1:
        return w, h, planes[0].astype(np.uint8)
    y, cb, cr = planes
    r = np.clip(np.floor(y + 1.402 * (cr - 128) + 0.5), 0, 255)
    g = np.clip(
        np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5),
        0,
        255,
    )
    b = np.clip(np.floor(y + 1.772 * (cb - 128) + 0.5), 0, 255)
    return w, h, np.stack([r, g, b], axis=-1).astype(np.uint8)


def _imgs():
    rng = np.random.default_rng(99)
    x = np.linspace(0, 255, 40)
    smooth = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    noisy = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    odd = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    return [smooth, noisy, odd]


def test_decoder_matches_independent_naive_decoder_gray():
    """Main decoder vs the from-first-principles one: equal to within
    +-1 LSB (float IDCT summation-order ulps can flip a .5 rounding —
    the cross-decoder tolerance libjpeg documents), >=97% exact —
    round 10: the engine decoder's IDCT is the 13-bit INTEGER islow
    (machine-independent); vs the naive exact-float IDCT the per-plane
    rounding drift stays within +-1 LSB (libjpeg documents the same
    for its integer/float pairs). In COLOR images a +-1 plane drift
    can propagate through the YCbCr->RGB 1.772/1.402 factors to +-2
    in a channel — the color checks bound that."""
    for img in _imgs():
        for q in (35, 75, 92):
            data = encode_jpeg(img, quality=q)
            w, h, nc, got = decode_jpeg(data)
            nw, nh, naive = _naive_decode(data)
            assert (w, h) == (nw, nh) == (img.shape[1], img.shape[0])
            diff = np.abs(got.astype(int) - naive.astype(int))
            assert diff.max() <= 1, diff.max()  # single plane: +-1
            assert (diff == 0).mean() >= 0.97


def test_decoder_matches_naive_color_and_subsampling():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 26, 3), dtype=np.uint8)
    for ss in ("444", "420"):
        data = encode_jpeg(img, quality=80, subsampling=ss)
        w, h, nc, got = decode_jpeg(data)
        nw, nh, naive = _naive_decode(data)
        assert (w, h, nc) == (26, 19, 3)
        diff = np.abs(got.astype(int) - naive.astype(int))
        # +-1 plane drift through the YCbCr->RGB matrix can reach +-2
        assert diff.max() <= 2
        assert (diff == 0).mean() >= 0.95


def test_decoder_matches_naive_with_restart_markers():
    img = _imgs()[0]
    data = encode_jpeg(img, quality=70, restart_interval=2)
    assert b"\xff\xd0" in data  # RST0 actually emitted
    _, _, _, got = decode_jpeg(data)
    _, _, naive = _naive_decode(data)
    assert np.abs(got.astype(int) - naive.astype(int)).max() <= 1


def test_roundtrip_quality_psnr_floor():
    """Lossy but sane: smooth images reconstruct above a PSNR floor that
    rises with quality."""
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    psnrs = []
    for q in (30, 75, 95):
        _, _, _, out = decode_jpeg(encode_jpeg(img, quality=q))
        mse = ((out.astype(float) - img.astype(float)) ** 2).mean()
        psnrs.append(10 * np.log10(255**2 / max(mse, 1e-12)))
    assert psnrs[0] > 30 and psnrs[2] > 40
    assert psnrs == sorted(psnrs)


def test_decode_is_deterministic():
    img = np.random.default_rng(1).integers(0, 256, (24, 24), dtype=np.uint8)
    data = encode_jpeg(img, quality=60)
    a = decode_jpeg(data)[3]
    b = decode_jpeg(data)[3]
    assert np.array_equal(a, b)


def test_unsupported_variants_rejected():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg(img, 75)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # a baseline stream REMARKED as SOF2 (round 10: progressive is a
    # supported mode now) is corrupt — its scan header claims an
    # interleaved Ss=0..Se=63 band, illegal in a progressive frame
    b1 = bytearray(good)
    b1[b1.find(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(b1))
    # arithmetic coding (SOF9 -> 0xC9)
    b2 = bytearray(good)
    b2[b2.find(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(ValueError, match="SOF9"):
        decode_jpeg(bytes(b2))
    # 12-bit precision
    b3 = bytearray(good)
    sof = b3.find(b"\xff\xc0")
    b3[sof + 4] = 12
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(bytes(b3))
    # truncated entropy segment
    with pytest.raises(ValueError, match="corrupt|truncated"):
        decode_jpeg(good[:-12])


def test_decode_batch_routes_jpeg_real_including_progressive(spark):
    """m07 plumbing: baseline AND (round 10) progressive JPEG payloads
    decode for real inside the Arrow kernel; a corrupt stream still
    falls back to the labeled fake path without failing the job."""
    import kmeanwithmapreduce_spark.operators.multimodal as mm
    from kmeanwithmapreduce_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    good = encode_jpeg(img, 75)
    prog = encode_jpeg_progressive(img, 75)
    corrupt = bytearray(good)
    corrupt[corrupt.find(b"\xff\xc0") + 1] = 0xC2  # fake SOF2: corrupt
    rows = [
        (1, bytearray(good)),
        (2, bytearray(prog)),
        (3, bytearray(bytes(corrupt))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.decode_batch(df).collect()}
    pix = decode_jpeg(good)[3]
    want_mean = float(pix.sum(dtype=np.int64)) / pix.size / 255.0
    assert (got[1].width, got[1].height, got[1].channels) == (16, 16, 1)
    assert got[1].mean_intensity == pytest.approx(want_mean, abs=0)
    # progressive decodes for REAL and equals the baseline decode
    assert (got[2].width, got[2].height, got[2].channels) == (16, 16, 1)
    assert got[2].mean_intensity == got[1].mean_intensity
    # the corrupt payload took the deterministic fake path
    n = len(bytes(corrupt))
    assert got[3].width == 16 + n % 64 and got[3].channels == 3


def test_malformed_tables_raise_valueerror_not_keyerror(spark):
    """A JPEG whose SOF references an undefined quant table (or whose
    SOS names an unknown component) must raise ValueError — so
    decode_batch's one-bad-payload isolation routes it to the fake path
    instead of the whole Spark job dying on a KeyError."""
    import kmeanwithmapreduce_spark.operators.multimodal as mm

    img = np.zeros((8, 8), dtype=np.uint8)
    good = encode_jpeg(img, 75)

    # SOF0 component 1 -> quant table id 3 (never defined)
    bad_q = bytearray(good)
    sof = bad_q.find(b"\xff\xc0")
    bad_q[sof + 2 + 8] = 3  # Tq byte of component 1
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(bad_q))

    # SOS names component id 9, absent from SOF
    bad_c = bytearray(good)
    sos = bad_c.find(b"\xff\xda")
    bad_c[sos + 2 + 3] = 9  # Cs byte
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(bad_c))

    # and through the Spark kernel: both land on the fake path, job lives
    rows = [(1, bytearray(bytes(bad_q))), (2, bytearray(bytes(bad_c)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.decode_batch(df).collect()}
    assert got[1].channels == 3 and got[2].channels == 3  # fake-path shape


# --------------------------------------------------------------------------
# Round 9: MJPEG-in-AVI (functions/avi.py routes 'MJPG' frames through
# this decoder — the last in-sandbox-closable codec fake).


def _movi_jpegs(blob: bytes):
    """Extract the raw '00dc' JPEG chunks from an AVI (independent
    container walk: scan for the chunk tags directly)."""
    import struct as _struct

    out, pos = [], 12
    def walk(pos, end):
        while pos + 8 <= end:
            tag = blob[pos:pos + 4]
            (ln,) = _struct.unpack_from("<I", blob, pos + 4)
            start = pos + 8
            if tag == b"LIST":
                walk(start + 4, start + ln)
            elif tag == b"00dc":
                out.append(blob[start:start + ln])
            pos = start + ln + (ln & 1)
    walk(pos, len(blob))
    return out


def test_mjpeg_avi_frames_match_naive_decoder():
    """Container path == per-frame naive JPEG decode (+-1 LSB): the AVI
    walker must hand each '00dc' chunk to the JPEG kernel unmangled,
    for both chroma layouts and across the quality ladder."""
    from kmeanwithmapreduce_spark.functions.avi import (
        decode_avi_rgb,
        encode_avi_mjpeg,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (3, 8, 16, 3), dtype=np.uint8)
    for q, ss in ((50, "444"), (80, "420"), (95, "444")):
        blob = encode_avi_mjpeg(frames, fps=10, quality=q, subsampling=ss)
        w, h, n, got = decode_avi_rgb(blob)
        assert (w, h, n) == (16, 8, 3)
        chunks = _movi_jpegs(blob)
        assert len(chunks) == 3
        for i, chunk in enumerate(chunks):
            nw, nh, naive = _naive_decode(chunk)
            assert (nw, nh) == (16, 8)
            diff = np.abs(got[i].astype(int) - naive.astype(int))
            assert diff.max() <= 2 and (diff == 0).mean() >= 0.90


def test_mjpeg_avi_fidelity_and_refusals():
    from kmeanwithmapreduce_spark.functions.avi import (
        MJPG_FOURCC,
        decode_avi_rgb,
        encode_avi_mjpeg,
    )

    base = np.linspace(0, 255, 16 * 24 * 3).reshape(16, 24, 3)
    frames = np.stack(
        [np.clip(base + i * 3, 0, 255) for i in range(2)]
    ).astype(np.uint8)
    blob = encode_avi_mjpeg(frames, quality=95)
    w, h, n, got = decode_avi_rgb(blob)
    assert (w, h, n) == (24, 16, 2)
    err = np.abs(got.astype(int) - frames.astype(int))
    assert err.mean() < 2.0  # lossy, but close on smooth content
    # determinism: encode and decode are pure functions
    assert encode_avi_mjpeg(frames, quality=95) == blob
    # any OTHER compression still refuses to the labeled fake path
    import struct as _struct

    bad = bytearray(blob)
    pat = _struct.pack("<I", MJPG_FOURCC)
    first = bytes(bad).find(pat)            # strh fourcc
    second = bytes(bad).find(pat, first + 4)  # strf biCompression
    bad[second:second + 4] = b"H264"
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi_rgb(bytes(bad))


# --------------------------------------------------------------------------
# Round 10: progressive (SOF2) decoding. The pin: progressive and
# baseline encodes quantize IDENTICAL coefficients, so their decodes
# must be bit-identical — an airtight cross-entropy-path check.


def _prog_pair(img, q, sub="444", rst=0):
    from kmeanwithmapreduce_spark.functions.jpeg import encode_jpeg_progressive

    base = decode_jpeg(encode_jpeg(img, q, subsampling=sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, q, subsampling=sub, restart_interval=rst)
    )
    return base, prog


@pytest.mark.parametrize(
    "shape,sub",
    [
        ((16, 16), "444"),
        ((24, 17), "444"),
        ((33, 29, 3), "420"),
        ((64, 48, 3), "444"),
        ((8, 8, 3), "420"),
    ],
)
def test_progressive_decode_equals_baseline(shape, sub):
    rng = np.random.default_rng(42)
    for q in (30, 75, 95):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base, prog = _prog_pair(img, q, sub)
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])


def test_progressive_long_eob_runs_and_gradients():
    # flat image: every AC band is one long EOB run (EOBn with n > 0)
    flat = np.full((48, 48), 130, dtype=np.uint8)
    base, prog = _prog_pair(flat, 75)
    assert np.array_equal(base[3], prog[3])
    # smooth gradient: sparse ACs exercise ZRL + refinement corrections
    grid = np.add.outer(np.arange(40) * 3, np.arange(56) * 2) % 256
    base, prog = _prog_pair(grid.astype(np.uint8), 50)
    assert np.array_equal(base[3], prog[3])


def test_progressive_with_restart_intervals():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    for rst in (1, 3, 5):
        base, prog = _prog_pair(img, 60, "444", rst)
        assert np.array_equal(base[3], prog[3])
    base, prog = _prog_pair(img, 60, "420", 2)
    assert np.array_equal(base[3], prog[3])


def test_progressive_corrupt_streams_raise_valueerror():
    from kmeanwithmapreduce_spark.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    good = encode_jpeg_progressive(img, 75)
    # truncated mid-scan
    with pytest.raises(ValueError, match="corrupt|truncated"):
        decode_jpeg(good[: len(good) // 2])
    # SOS before SOF2: drop everything between APP0 and the first SOS
    b = bytearray(good)
    sof = b.find(b"\xff\xc2")
    sos = b.find(b"\xff\xda")
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg(bytes(b[:sof]) + bytes(b[sos:]))
