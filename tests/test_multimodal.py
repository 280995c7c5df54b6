"""Multimodal plumbing: payload attach, decode/resize/frame-sample
stubs (schema + batch-shape contracts), and the composed pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.operators import multimodal as mm
from kmeanwithmapreduce_spark.sources.readers import load_table


def test_payload_roundtrip(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    blobs = mm.with_binary_payload(d)
    row = blobs.select("text", "payload").first()
    assert bytes(row["payload"]).decode("utf-8") == row["text"]


def test_decode_schema_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    out = mm.decode_batch(mm.with_binary_payload(d))
    assert out.schema == mm.DECODED_SCHEMA
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b
    r = out.first()
    assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
    assert 0.0 <= r["mean_intensity"] <= 1.0


def test_resize_stub(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    out = mm.resize_batch(mm.with_binary_payload(d), 32, 16)
    rows = out.collect()
    assert all(len(bytes(r["payload"])) == 32 * 16 for r in rows)
    assert all(r["width"] == 32 and r["height"] == 16 for r in rows)


def test_frame_sample_stub(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(10)
    out = mm.frame_sample_batch(mm.with_binary_payload(d), every_n_bytes=100)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in per_doc)
    assert len(per_doc) == 10


def test_decode_vectorized_matches_scalar_spec(spark, sf_dir):
    """The batch-vectorized decode must equal the scalar _fake_decode
    spec element-wise, including multi-byte utf-8 and empty payloads."""
    texts = ["héllo wörld", "日本語のテキスト", "", "a" * 300, "naïve—café"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"], r["channels"], r["mean_intensity"])
        for r in mm.decode_batch(mm.with_binary_payload(d)).collect()
    }
    for i, t in enumerate(texts):
        b = t.encode("utf-8")
        w, h, c, mi = mm._fake_decode(b)
        assert got[i] == (len(b), w, h, c, mi)


def test_m02_oracle_holds_for_non_ascii(spark, tmp_path):
    """ADVICE r2: the old oracle summed code points of the first 256
    CHARACTERS; the byte-based oracle must match the stub on multi-byte
    utf-8 corpora too."""
    import duckdb

    texts = ["héllo wörld", "日本語のテキスト" * 40, "", "ascii only", "naïve—café é" * 30]
    d = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    fx = str(tmp_path / "documents.parquet")
    d.write.parquet(fx)
    got = mm.m02_decoded_features(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fx}/*.parquet'")
    want = con.execute(mm.M02_SQL).fetchdf()
    con.close()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    for col in ("n_bytes", "width", "height", "channels", "intensity_t"):
        assert list(got[col]) == list(want[col]), col


def test_m03_pipeline(spark, sf_dir):
    out = mm.m03_cluster_decoded(spark, sf_dir)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, sf_dir, "documents"
    ).count()


# --------------------------------------------------------------------------
# Real PNG codec (functions/png.py) — round 7


def _naive_reference_decode(data):
    """Independent scanline-at-a-time decoder written straight from the
    RFC 2083 filter definitions (plain lists, no numpy) — decorrelates
    the test from functions/png.py's vectorized implementation."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
    w, h, _bd, ct, _, _, _ = hdr
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    stride = w * ch
    raw = zlib.decompress(idat)
    recon = []
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        cur = [0] * stride
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = recon[y - 1][x] if y > 0 else 0
            c = recon[y - 1][x - ch] if (y > 0 and x >= ch) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[x] = (line[x] + pred) & 0xFF
        recon.append(cur)
    return w, h, ch, recon


def test_png_codec_roundtrip_all_filters_and_color_types():
    """encode -> decode is the identity for every (filter, color type)
    pair, and the decode agrees with the independent naive reference."""
    import numpy as np

    from kmeanwithmapreduce_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(42)
    shapes = [(7, 5), (6, 4, 3), (5, 3, 2), (4, 4, 4), (1, 1), (2, 9, 3)]
    for shape in shapes:
        pix = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = pix if pix.ndim == 3 else pix[:, :, None]
        for ft in range(5):
            data = encode_png(pix, filter_type=ft)
            w, h, c, got = decode_png(data)
            assert (w, h, c) == (want.shape[1], want.shape[0], want.shape[2])
            assert np.array_equal(got, want), (shape, ft)
            rw, rh, rc, ref = _naive_reference_decode(data)
            assert (rw, rh, rc) == (w, h, c)
            assert np.array_equal(
                np.array(ref, dtype=np.uint8).reshape(h, w, c), got
            ), (shape, ft, "naive reference disagrees")


def test_png_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from kmeanwithmapreduce_spark.functions.png import decode_png, encode_png

    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    good = bytearray(
        encode_png(np.zeros((2, 2), dtype=np.uint8), filter_type=0)
    )
    # IHDR body starts at offset 16; bit depth is body[8], color type [9]
    bad_depth = bytearray(good)
    bad_depth[16 + 8] = 16
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(bad_depth))
    bad_palette = bytearray(good)
    bad_palette[16 + 9] = 3
    with _pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(bad_palette))


def test_decode_batch_routes_png_and_fake(spark):
    """A mixed batch: PNG payloads decode for real (IHDR geometry,
    exact pixel mean), non-PNG payloads keep the labeled fake path."""
    import numpy as np

    from kmeanwithmapreduce_spark.functions.png import encode_png

    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    img2 = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    fake_payload = b"just some text bytes"
    rows = [
        (1, bytearray(encode_png(img1, filter_type=4))),
        (2, bytearray(encode_png(img2, filter_type=1))),
        (3, bytearray(fake_payload)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.decode_batch(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (11, 9, 1)
    assert abs(got[1]["mean_intensity"] - img1.mean() / 255.0) < 1e-12
    assert (got[2]["width"], got[2]["height"], got[2]["channels"]) == (6, 5, 3)
    assert abs(got[2]["mean_intensity"] - img2.mean() / 255.0) < 1e-12
    fw, fh, fc, fmi = mm._fake_decode(fake_payload)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"]) == (fw, fh, fc)
    assert abs(got[3]["mean_intensity"] - fmi) < 1e-12


def test_m04_roundtrip_matches_duckdb(spark, tmp_path):
    """m04 end-to-end on a hand-built corpus (multi-byte utf-8, empty,
    >256-byte texts; doc_ids cover all five filter types) vs its
    DuckDB oracle — the registry sweep re-checks it at sf0.01."""
    import duckdb

    texts = ["héllo wörld", "日本語のテキスト" * 40, "", "ascii only",
             "naïve—café é" * 30, "x" * 500, "mixed 混合 bytes"]
    d = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    fx = str(tmp_path / "documents.parquet")
    d.write.parquet(fx)
    got = (
        mm.m04_png_roundtrip(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fx}/*.parquet'")
    want = con.execute(mm.M04_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
    con.close()
    for col in ("width", "height", "channels", "intensity_t"):
        assert list(got[col]) == list(want[col]), col


# --------------------------------------------------------------------------
# Real WAV codec (functions/wav.py) — round 7


def test_wav_codec_roundtrip():
    import numpy as np

    from kmeanwithmapreduce_spark.functions.wav import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    for shape, rate in [((100,), 8_000), ((64, 2), 44_100), ((1, 4), 16_000)]:
        samples = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        want = samples if samples.ndim == 2 else samples[:, None]
        got_rate, ch, got = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate and ch == want.shape[1]
        assert np.array_equal(got, want)


def test_wav_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from kmeanwithmapreduce_spark.functions.wav import decode_wav, encode_wav

    with _pytest.raises(ValueError, match="signature"):
        decode_wav(b"\x89PNG not a wav")
    good = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    # fmt body starts at byte 20; bits-per-sample is body offset 14.
    # 8-bit PCM and mu-law are REAL decoders since round 13, so the
    # rejection probes use genuinely unsupported shapes: 12-bit PCM and
    # an MP3-in-WAV format tag.
    bad_bits = bytearray(good)
    bad_bits[20 + 14] = 12
    with _pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_bits))
    bad_fmt = bytearray(good)
    bad_fmt[20] = 0x55  # MPEG layer 3 payload
    with _pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(bad_fmt))


def test_decode_audio_batch_routes_wav_and_fake(spark):
    import numpy as np

    from kmeanwithmapreduce_spark.functions.wav import encode_wav

    rng = np.random.default_rng(3)
    s1 = rng.integers(-32768, 32768, size=200, dtype=np.int16)
    s2 = rng.integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(s1, 22_050))),
        (2, bytearray(encode_wav(s2, 8_000))),
        (3, bytearray(b"plain text payload")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.decode_audio_batch(df).collect()}
    assert (got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_frames"]) == (22_050, 1, 200)
    want_rms1 = float(np.sqrt((s1.astype(np.int64) ** 2).sum() / s1.size))
    assert abs(got[1]["rms"] - want_rms1) < 1e-9
    assert (got[2]["sample_rate"], got[2]["n_channels"], got[2]["n_frames"]) == (8_000, 2, 50)
    assert got[3]["sample_rate"] == 16_000  # fake path


def test_m05_roundtrip_matches_duckdb(spark, tmp_path):
    """m05 end-to-end on a hand-built corpus (multi-byte utf-8, empty,
    odd-length, >512-byte texts) vs its DuckDB oracle — the registry
    sweep re-checks it at sf0.01."""
    import duckdb

    texts = ["héllo wörld", "日本語のテキスト" * 60, "", "odd", "x" * 700,
             "naïve—café é" * 30]
    d = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    fx = str(tmp_path / "documents.parquet")
    d.write.parquet(fx)
    got = (
        mm.m05_wav_roundtrip(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fx}/*.parquet'")
    want = con.execute(mm.M05_SQL).fetchdf().sort_values("doc_id").reset_index(drop=True)
    con.close()
    for col in ("sample_rate", "n_channels", "n_frames", "rms_t"):
        assert list(got[col]) == list(want[col]), col


# --------------------------------------------------------------------------
# Real AVI codec (functions/avi.py) — round 7


def test_avi_codec_roundtrip_including_row_padding():
    """encode -> decode is the identity, exercising the three DIB
    quirks: width 5 (rows 15 -> padded 16 bytes), bottom-up row order,
    BGR sample order — all invisible if roundtrip is exact AND a
    hand-oriented pixel lands where the spec says."""
    import numpy as np

    from kmeanwithmapreduce_spark.functions.avi import (
        decode_avi_rgb,
        encode_avi_rgb,
    )

    rng = np.random.default_rng(21)
    for n, h, w in [(2, 2, 5), (3, 4, 4), (1, 1, 1), (4, 3, 7)]:
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        data = encode_avi_rgb(frames, fps=10)
        gw, gh, gn, got = decode_avi_rgb(data)
        assert (gw, gh, gn) == (w, h, n)
        assert np.array_equal(got, frames)
    # hand-check the on-disk orientation: a single red top-left pixel
    # must be stored in the LAST row (bottom-up) as B,G,R = 0,0,255
    one = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    one[0, 0, 0] = [255, 0, 0]  # red at (row 0, col 0)
    raw = encode_avi_rgb(one, fps=10)
    movi = raw.index(b"00db")
    frame = raw[movi + 8 : movi + 8 + 16]  # 2 rows x 8 padded bytes
    assert frame[:8] == bytes(8)  # disk row 0 = image BOTTOM row: zeros
    assert frame[8:11] == b"\x00\x00\xff"  # disk row 1 col 0: BGR red


def test_avi_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pytest

    from kmeanwithmapreduce_spark.functions.avi import (
        decode_avi_rgb,
        encode_avi_rgb,
    )

    with _pytest.raises(ValueError, match="signature"):
        decode_avi_rgb(b"RIFF\x00\x00\x00\x00WAVEnot video")
    good = bytearray(encode_avi_rgb(np.zeros((1, 2, 2, 3), dtype=np.uint8)))
    # biCompression is bytes 16..20 of the strf body; find strf and patch
    strf = bytes(good).index(b"strf")
    bad = bytearray(good)
    bad[strf + 8 + 16] = 1  # BI_RLE8
    with _pytest.raises(ValueError, match="unsupported"):
        decode_avi_rgb(bytes(bad))


def test_frame_sample_routes_avi_and_fake(spark):
    import numpy as np

    from kmeanwithmapreduce_spark.functions.avi import encode_avi_rgb

    rng = np.random.default_rng(5)
    vid = rng.integers(0, 256, size=(6, 2, 3, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_avi_rgb(vid, fps=10))),
        (2, bytearray(b"x" * 600)),  # fake path: byte slices
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = mm.frame_sample_batch(df, every_n_bytes=256, max_frames=4).collect()
    real = sorted((r.frame_idx, bytes(r.frame)) for r in got if r.doc_id == 1)
    # 6 frames, max 4, step 1 -> frames 0,1,2,3; bytes are decoded RGB
    assert [i for i, _ in real] == [0, 1, 2, 3]
    for i, b in real:
        assert b == vid[i].tobytes()
    fake = [r for r in got if r.doc_id == 2]
    assert len(fake) == 2 and len(bytes(fake[0].frame)) == 256


def test_m06_avi_frames_match_duckdb(spark, tmp_path):
    import duckdb

    texts = ["héllo wörld", "日本語のテキスト" * 10, "", "short", "y" * 100]
    d = spark.createDataFrame(
        [(i, t, "src") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    fx = str(tmp_path / "documents.parquet")
    d.write.parquet(fx)
    got = (
        mm.m06_avi_frame_stats(spark, str(tmp_path))
        .toPandas()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{fx}/*.parquet'")
    want = (
        con.execute(mm.M06_SQL)
        .fetchdf()
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == 2 * len(texts)
    for col in ("frame_idx", "width", "height", "mean_t"):
        assert list(got[col]) == list(want[col]), col


def test_codec_kernels_fall_back_not_crash(spark):
    """Round-7 review findings: payloads that MATCH a container magic
    but carry an unsupported variant must take the labeled fake path —
    one bad payload must never fail the job. Covers: non-WAVE RIFF
    (AVI/WebP-shaped) and ADPCM WAV in the audio kernel; palette PNG in
    the image kernel; compressed AVI in the frame sampler."""
    import numpy as np

    from kmeanwithmapreduce_spark.functions.avi import encode_avi_rgb
    from kmeanwithmapreduce_spark.functions.png import encode_png
    from kmeanwithmapreduce_spark.functions.wav import encode_wav

    # -- audio: RIFF-but-not-WAVE, and WAVE-but-ADPCM
    avi_bytes = encode_avi_rgb(np.zeros((1, 2, 2, 3), dtype=np.uint8))
    adpcm = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
    adpcm[20] = 2  # fmt tag -> MS ADPCM
    rows = [(1, bytearray(avi_bytes)), (2, adpcm), (3, bytearray(b"RIFFxxxx"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in mm.decode_audio_batch(df).collect()}
    assert len(got) == 3
    for r in got.values():  # all on the fake path: its fixed rate
        assert r.sample_rate == 16_000 and r.n_channels == 1

    # -- image: palette-flagged PNG falls back, valid PNG still real
    good = encode_png(np.full((3, 3), 7, dtype=np.uint8))
    pal = bytearray(good)
    pal[16 + 9] = 3  # color type -> palette
    df2 = spark.createDataFrame(
        [(1, bytearray(good)), (2, pal)], "doc_id long, payload binary"
    )
    got2 = {r.doc_id: r for r in mm.decode_batch(df2).collect()}
    assert (got2[1].width, got2[1].height) == (3, 3)  # real decode
    fw, fh, _c, _m = mm._fake_decode(bytes(pal))
    assert (got2[2].width, got2[2].height) == (fw, fh)  # fake fallback

    # -- video: compression-flagged AVI falls back to byte slices
    bad_avi = bytearray(avi_bytes)
    strf = bytes(bad_avi).index(b"strf")
    bad_avi[strf + 8 + 16] = 1
    df3 = spark.createDataFrame(
        [(1, bad_avi)], "doc_id long, payload binary"
    )
    got3 = mm.frame_sample_batch(df3, every_n_bytes=64).collect()
    assert len(got3) >= 1  # fake slices, not a crash
    assert bytes(got3[0].frame) == bytes(bad_avi)[:64]


def test_avi_decode_topdown_and_dimension_crosscheck():
    """Foreign encoders emit negative strf biHeight = TOP-DOWN rows:
    the decoder must take geometry from strf, skip the bottom-up flip,
    and reject an avih/strf dimension disagreement."""
    import struct

    import numpy as np
    import pytest as _pytest

    from kmeanwithmapreduce_spark.functions.avi import (
        decode_avi_rgb,
        encode_avi_rgb,
    )

    rng = np.random.default_rng(33)
    frames = rng.integers(0, 256, size=(2, 3, 5, 3), dtype=np.uint8)
    h, w = 3, 5
    data = bytearray(encode_avi_rgb(frames, fps=10))

    # build the top-down variant: negate strf biHeight and reverse the
    # stored row order of every frame chunk (bottom-up -> top-down)
    strf = bytes(data).index(b"strf")
    struct.pack_into("<i", data, strf + 8 + 8, -h)
    row_bytes = (w * 3 + 3) & ~3
    pos = 0
    while True:
        pos = bytes(data).find(b"00db", pos)
        if pos < 0:
            break
        body = pos + 8
        rows = np.frombuffer(
            bytes(data[body : body + row_bytes * h]), dtype=np.uint8
        ).reshape(h, row_bytes)
        data[body : body + row_bytes * h] = rows[::-1].tobytes()
        pos = body + row_bytes * h
    gw, gh, gn, got = decode_avi_rgb(bytes(data))
    assert (gw, gh, gn) == (w, h, 2)
    assert np.array_equal(got, frames)

    # avih says 5x3 but strf says 4x3 -> loud geometry error
    bad = bytearray(encode_avi_rgb(frames, fps=10))
    strf = bytes(bad).index(b"strf")
    struct.pack_into("<i", bad, strf + 8 + 4, 4)  # biWidth
    with _pytest.raises(ValueError, match="disagrees"):
        decode_avi_rgb(bytes(bad))
