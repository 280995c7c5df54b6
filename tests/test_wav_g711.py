"""G.711 mu-law / A-law WAV (round 13, functions/wav.py): exact-byte
parity against CPython's ``audioop`` — an INDEPENDENT C implementation
of the same ITU-T G.711 / CCITT reference algorithm — plus container
round-trips and the multimodal routing.

``audioop`` is stdlib in this container's 3.11 (removed in 3.13); the
parity tests skip if it ever disappears, but the container round-trip
and routing tests stand on their own.
"""

from __future__ import annotations

import numpy as np
import pytest

from kmeanwithmapreduce_spark.functions.wav import (
    _ALAW_TABLE,
    _ULAW_TABLE,
    _g711_encode_bytes,
    decode_wav,
    encode_wav_g711,
)


def _signal(n, channels, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    base = 9000 * np.sin(2 * np.pi * t / 37.0) + 5000 * np.sin(
        2 * np.pi * t / 211.0 + np.arange(channels)[None, :]
    )
    return (base + rng.integers(-500, 500, (n, channels))).astype(np.int16)


def test_decode_tables_match_audioop_exhaustively():
    audioop = pytest.importorskip("audioop")
    all_bytes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype="<i2")
    assert np.array_equal(_ULAW_TABLE, ref_u)
    assert np.array_equal(_ALAW_TABLE, ref_a)


def test_encoders_match_audioop_over_all_int16():
    audioop = pytest.importorskip("audioop")
    xs = np.arange(-32768, 32768, dtype=np.int16)
    pcm = xs.astype("<i2").tobytes()
    ref_u = audioop.lin2ulaw(pcm, 2)
    ref_a = audioop.lin2alaw(pcm, 2)
    assert _g711_encode_bytes(xs, "mulaw") == ref_u
    assert _g711_encode_bytes(xs, "alaw") == ref_a


@pytest.mark.parametrize("law,tag", [("mulaw", 0x07), ("alaw", 0x06)])
@pytest.mark.parametrize("channels,n", [(1, 777), (2, 400)])
def test_container_roundtrip_is_the_table_quantization(law, tag, channels, n):
    """decode(encode(x)) must be EXACTLY table[reference_encoder(x)] —
    the G.711 quantization, nothing else (no off-by-one framing, no
    channel deinterleave bugs)."""
    sig = _signal(n, channels, seed=7 * channels + n)
    wav = encode_wav_g711(sig, 8_000, law=law)
    # fmt tag really is the G.711 one (byte 20 of the canonical layout)
    assert wav[20] == tag
    rate, ch, out = decode_wav(wav)
    assert (rate, ch) == (8_000, channels) and out.shape == (n, channels)
    table = _ULAW_TABLE if law == "mulaw" else _ALAW_TABLE
    enc = np.frombuffer(
        _g711_encode_bytes(sig, law), dtype=np.uint8
    ).reshape(n, channels)
    assert np.array_equal(out, table[enc])
    # and the quantization tracks the signal (G.711 SNR band)
    err = np.sqrt(((sig - out).astype(np.float64) ** 2).mean())
    rms = np.sqrt((sig.astype(np.float64) ** 2).mean())
    assert err < 0.05 * rms


def test_bad_law_raises():
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(np.zeros(4, dtype=np.int16), law="dpcm")


def test_g711_routes_through_multimodal_real_path(spark):
    from kmeanwithmapreduce_spark.operators.multimodal import (
        decode_audio_batch,
    )

    rows = []
    for i, law in enumerate(("mulaw", "alaw")):
        sig = _signal(300, 1, seed=i)
        rows.append((i, bytearray(encode_wav_g711(sig, 8_000, law=law))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_audio_batch(df).collect()}
    for r in got.values():  # real path: the encoded rate, exact frames
        assert (r.sample_rate, r.n_channels, r.n_frames) == (8_000, 1, 300)
