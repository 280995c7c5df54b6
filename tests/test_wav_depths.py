"""Round 13: IEEE-float WAV (tag 3), 24-bit PCM, 8-bit unsigned PCM —
the last WAV depth families off the fake list. Pure-numpy round-trip
and byte-layout tests (no Spark session needed except the routing
test, which exercises the multimodal kernel's dtype branches)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kmeanwithmapreduce_spark.functions.wav import (
    decode_wav,
    encode_wav_float,
    encode_wav_pcm8,
    encode_wav_pcm24,
)


@pytest.mark.parametrize("bits,dtype", [(32, np.float32), (64, np.float64)])
@pytest.mark.parametrize("channels", [1, 2])
def test_float_wav_roundtrip_bit_exact(bits, dtype, channels):
    rng = np.random.default_rng(bits + channels)
    sig = rng.standard_normal((257, channels)).astype(dtype)
    sig[0, 0] = np.float32("nan") if bits == 32 else float("nan")
    sig[1, 0] = np.inf  # floats pass through untouched, even non-finite
    wav = encode_wav_float(sig, 48_000, bits=bits)
    rate, ch, out = decode_wav(wav)
    assert (rate, ch) == (48_000, channels)
    assert out.dtype == dtype and out.shape == sig.shape
    # bit-for-bit, including the NaN payload
    assert np.array_equal(
        out.view(np.uint32 if bits == 32 else np.uint64),
        sig.view(np.uint32 if bits == 32 else np.uint64),
    )


def test_float_wav_fmt_fields():
    wav = encode_wav_float(np.zeros(4, dtype=np.float32), 8_000, bits=32)
    tag, ch, rate, brate, align, bits = struct.unpack_from("<HHIIHH", wav, 20)
    assert (tag, ch, rate, brate, align, bits) == (3, 1, 8000, 32000, 4, 32)
    with pytest.raises(ValueError, match="bits"):
        encode_wav_float(np.zeros(4), bits=16)


@pytest.mark.parametrize("channels", [1, 2])
def test_pcm24_roundtrip_lossless_including_extremes(channels):
    rng = np.random.default_rng(24 + channels)
    sig = rng.integers(-8388608, 8388608, (301, channels), dtype=np.int32)
    sig[0, 0], sig[1, 0] = 8388607, -8388608  # depth extremes
    wav = encode_wav_pcm24(sig, 44_100)
    rate, ch, out = decode_wav(wav)
    assert (rate, ch) == (44_100, channels)
    assert out.dtype == np.int32 and np.array_equal(out, sig)
    with pytest.raises(ValueError, match="24-bit range"):
        encode_wav_pcm24(np.array([8388608], dtype=np.int64))


def test_pcm24_byte_layout_is_little_endian_twos_complement():
    # -1 -> FF FF FF; 1 -> 01 00 00 (3-byte LE)
    wav = encode_wav_pcm24(np.array([-1, 1], dtype=np.int32))
    pos = wav.index(b"data") + 8
    assert wav[pos : pos + 6] == b"\xff\xff\xff\x01\x00\x00"


def test_pcm8_roundtrip_and_unsigned_storage():
    sig = (np.arange(-128, 128, dtype=np.int16) << 8).astype(np.int16)
    wav = encode_wav_pcm8(sig, 11_025)
    rate, ch, out = decode_wav(wav)
    assert (rate, ch) == (11_025, 1)
    assert out.dtype == np.int16 and np.array_equal(out.ravel(), sig)
    # stored bytes are UNSIGNED: the minimum sample stores as 0x00
    pos = wav.index(b"data") + 8
    assert wav[pos] == 0 and wav[pos + 255] == 255


def test_extensible_format_still_refuses():
    wav = bytearray(encode_wav_float(np.zeros(8, dtype=np.float32)))
    wav[20:22] = struct.pack("<H", 0xFFFE)  # WAVE_FORMAT_EXTENSIBLE
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(wav))


def test_depths_route_through_multimodal_real_path(spark):
    from kmeanwithmapreduce_spark.operators.multimodal import (
        decode_audio_batch,
    )

    f32 = encode_wav_float(
        np.linspace(-1, 1, 300, dtype=np.float32), 8_000, bits=32
    )
    p24 = encode_wav_pcm24(
        np.full(200_000, 8_388_607, dtype=np.int32), 8_000
    )  # 200k max-amplitude samples: the int64-overflow regression case
    p8 = encode_wav_pcm8(np.zeros(50, dtype=np.int16), 8_000)
    df = spark.createDataFrame(
        [(1, bytearray(f32)), (2, bytearray(p24)), (3, bytearray(p8))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_audio_batch(df).collect()}
    assert (got[1].sample_rate, got[1].n_frames) == (8_000, 300)
    assert (got[2].sample_rate, got[2].n_frames) == (8_000, 200_000)
    # exact: constant max amplitude -> rms == the amplitude
    assert got[2].rms == pytest.approx(8_388_607.0, abs=1e-6)
    assert (got[3].sample_rate, got[3].n_frames) == (8_000, 50)
    assert got[3].rms == 0.0
