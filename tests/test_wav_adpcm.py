"""IMA/DVI ADPCM WAV codec (functions/wav.py, round 11 — the smallest
remaining labeled media fake retired): decode parity against an
independent naive reference decoder (the m07/m09 discipline — here
EXACT integer equality, the algorithm is pure integer), encoder
sanity, fact-chunk truncation, container routing, and the negative
cases that must stay on the fake path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from kmeanwithmapreduce_spark.functions.wav import (
    decode_wav,
    encode_wav,
    encode_wav_ima,
)

# -- independent reference decoder (straight from the IMA spec text) ---------

_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def ref_decode_ima_wav(data: bytes):
    """Naive chunk walk + per-nibble loop, written independently of the
    module (different structure: flat nibble list per channel)."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos, fmt, pcm, fact = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
        elif tag == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
    tag_, ch, rate, _br, align, bits = fmt
    assert tag_ == 0x11 and bits == 4
    chans = [[] for _ in range(ch)]
    for b0 in range(0, len(pcm) // align * align, align):
        blk = pcm[b0 : b0 + align]
        state = []
        for c in range(ch):
            (pred,) = struct.unpack_from("<h", blk, 4 * c)
            idx = blk[4 * c + 2]
            state.append([pred, idx])
            chans[c].append(pred)
        p = 4 * ch
        while p + 4 * ch <= len(blk):
            for c in range(ch):
                nibbles = []
                for byte in blk[p + 4 * c : p + 4 * c + 4]:
                    nibbles += [byte & 15, byte >> 4]
                pred, idx = state[c]
                for nb in nibbles:
                    step = _STEPS[idx]
                    delta = step >> 3
                    if nb & 1:
                        delta += step >> 2
                    if nb & 2:
                        delta += step >> 1
                    if nb & 4:
                        delta += step
                    pred = pred - delta if nb & 8 else pred + delta
                    pred = max(-32768, min(32767, pred))
                    idx = max(0, min(88, idx + _INDEX_ADJ[nb & 7]))
                    chans[c].append(pred)
                state[c] = [pred, idx]
            p += 4 * ch
    n = min(len(x) for x in chans)
    if fact is not None:
        n = min(n, fact)
    return rate, ch, np.array([x[:n] for x in chans], dtype=np.int16).T


def _signal(n, channels, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    base = (
        9000 * np.sin(2 * np.pi * t * (3 + np.arange(channels)) / 480)
        + rng.normal(0, 600, size=(n, channels))
    )
    return np.clip(base, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("channels,n", [(1, 505), (1, 1700), (2, 505), (2, 1333)])
def test_ima_decode_matches_reference_exactly(channels, n):
    sig = _signal(n, channels, seed=7 * channels + n)
    wav = encode_wav_ima(sig, 8_000)
    rate, ch, got = decode_wav(wav)
    rrate, rch, want = ref_decode_ima_wav(wav)
    assert (rate, ch) == (rrate, rch) == (8_000, channels)
    assert got.shape == want.shape == (n, channels)
    assert np.array_equal(got, want)


def test_ima_roundtrip_tracks_the_signal():
    """ADPCM is lossy; the decoded signal must still track the source
    (4-bit quantization of a smooth signal — small relative error)."""
    sig = _signal(2000, 1, seed=3)
    _, _, dec = decode_wav(encode_wav_ima(sig, 16_000))
    err = np.abs(dec.astype(np.int64) - sig.astype(np.int64))
    assert float(np.mean(err)) < 600  # quantization-scale, not garbage
    assert dec[0, 0] == sig[0, 0]  # block header carries sample 0 exactly


def test_fact_chunk_truncates_padded_tail():
    sig = _signal(600, 1, seed=1)  # 505-frame blocks: tail is padded
    _, _, dec = decode_wav(encode_wav_ima(sig, 16_000))
    assert dec.shape == (600, 1)


def test_pcm_and_negative_formats_unchanged():
    sig = _signal(64, 1, seed=2)
    rate, ch, dec = decode_wav(encode_wav(sig, 16_000))
    assert np.array_equal(dec, sig)
    # MS ADPCM (tag 2) must STILL refuse (stays on the labeled fake)
    ms = bytearray(encode_wav(sig, 16_000))
    ms[20] = 2
    with pytest.raises(ValueError, match="unsupported WAV"):
        decode_wav(bytes(ms))


def test_decode_audio_batch_routes_ima_through_real_path(spark):
    from kmeanwithmapreduce_spark.operators.multimodal import (
        decode_audio_batch,
    )

    sig = _signal(505, 2, seed=9)
    wav = encode_wav_ima(sig, 22_050)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    (row,) = decode_audio_batch(df).collect()
    # the fake path would report (16000, 1, n_bytes//2); the real path
    # reports the container's true geometry
    assert (row.sample_rate, row.n_channels, row.n_frames) == (22_050, 2, 505)
    ss = sig.astype(np.int64)
    want_rms = float(np.sqrt(float((ss * ss).sum()) / sig.size))
    # rms over the DECODED samples, not the source — but 4-bit ADPCM
    # keeps energy close; assert the real-decode ballpark
    assert abs(row.rms - want_rms) / want_rms < 0.05


def test_encode_rejects_misaligned_block_align():
    """Round-11 ADVICE: block_align_per_ch that is not
    4-byte-header + whole data words (e.g. 10) made the nibble loop
    emit MORE bytes per block than block_align declares — every
    decoder then misaligns block boundaries and produces silently
    corrupt audio. Must refuse loudly instead."""
    sig = _signal(64, 1, seed=3)
    for bad in (4, 7, 10, 13, 253):
        with pytest.raises(ValueError, match="block_align_per_ch"):
            encode_wav_ima(sig, block_align_per_ch=bad)
    # the boundary valid sizes still encode and round-trip
    for ok in (8, 12, 256):
        _, _, out = decode_wav(encode_wav_ima(sig, block_align_per_ch=ok))
        assert out.shape == (64, 1)


def test_truncated_final_block_decodes_available_words():
    """Round-11 ADVICE: a truncated final block (legal in real IMA
    files) was silently DROPPED, returning fewer frames than the fact
    chunk claims with no error. Now the headers plus every complete
    word round decode (prefix-causal: identical to the full decode's
    prefix), and a tail too short for the headers raises."""
    from kmeanwithmapreduce_spark.functions.wav import _ima_decode_blocks

    sig = _signal(600, 1, seed=11)
    wav = encode_wav_ima(sig, block_align_per_ch=256)
    # pull the raw data chunk back out of the container
    pos, pcm = 12, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (length,) = struct.unpack_from("<I", wav, pos + 4)
        if tag == b"data":
            pcm = wav[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
    assert pcm is not None and len(pcm) == 2 * 256  # 505 frames/block
    full = _ima_decode_blocks(pcm, 1, 256)
    # cut the final block to header + 3 complete data words
    cut = pcm[: 256 + 4 + 3 * 4]
    part = _ima_decode_blocks(cut, 1, 256)
    assert part.shape[0] == 505 + 1 + 3 * 8
    assert np.array_equal(part, full[: part.shape[0]])
    # a tail that cannot even hold the channel headers is corrupt
    with pytest.raises(ValueError, match="final block"):
        _ima_decode_blocks(pcm[: 256 + 2], 1, 256)


# -- MS ADPCM (round 12): independent reference decoder from the spec --------

_MS_COEF1 = [256, 512, 0, 192, 240, 460, 392]
_MS_COEF2 = [0, -256, 0, 64, 0, -208, -232]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]


def ref_decode_ms_wav(data: bytes):
    """Naive MS ADPCM walk, written independently of the module: flat
    per-channel lists, explicit field-major header parse, one nibble
    at a time."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos, fmt_body, pcm, fact = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if tag == b"fmt ":
            fmt_body = body
        elif tag == b"data":
            pcm = body
        elif tag == b"fact":
            (fact,) = struct.unpack_from("<I", body, 0)
    tag_, ch, rate, _br, align, bits = struct.unpack_from("<HHIIHH", fmt_body, 0)
    assert tag_ == 2 and bits == 4
    (spb,) = struct.unpack_from("<H", fmt_body, 18)
    chans = [[] for _ in range(ch)]
    for b0 in range(0, len(pcm), align):
        blk = pcm[b0 : b0 + align]
        pred = [blk[c] for c in range(ch)]
        delta = [max(16, struct.unpack_from("<h", blk, ch + 2 * c)[0])
                 for c in range(ch)]
        s1 = [struct.unpack_from("<h", blk, 3 * ch + 2 * c)[0]
              for c in range(ch)]
        s2 = [struct.unpack_from("<h", blk, 5 * ch + 2 * c)[0]
              for c in range(ch)]
        blkout = [[s2[c], s1[c]] for c in range(ch)]
        k = 0
        for byte in blk[7 * ch :]:
            for nib in (byte >> 4, byte & 0x0F):
                c = k % ch
                signed = nib - 16 if nib >= 8 else nib
                acc = (s1[c] * _MS_COEF1[pred[c]]
                       + s2[c] * _MS_COEF2[pred[c]])
                # spec pseudocode: / 256 in C — truncation toward zero
                p = int(acc / 256)
                p += signed * delta[c]
                p = max(-32768, min(32767, p))
                delta[c] = max(16, (_MS_ADAPT[nib] * delta[c]) >> 8)
                s2[c], s1[c] = s1[c], p
                blkout[c].append(p)
                k += 1
        for c in range(ch):
            chans[c].extend(blkout[c][:spb])
    n = min(len(x) for x in chans)
    out = np.array([x[:n] for x in chans], dtype=np.int16).T
    if fact is not None:
        out = out[:fact]
    return rate, ch, out


@pytest.mark.parametrize("channels,n", [(1, 505), (1, 1200), (2, 700)])
def test_ms_decode_matches_reference_exactly(channels, n):
    from kmeanwithmapreduce_spark.functions.wav import encode_wav_ms

    sig = _signal(n, channels, seed=13 * channels + n)
    wav = encode_wav_ms(sig, 22_050)
    got = decode_wav(wav)
    want = ref_decode_ms_wav(wav)
    assert got[0] == want[0] == 22_050 and got[1] == want[1] == channels
    assert got[2].shape == want[2].shape == (n, channels)
    assert np.array_equal(got[2], want[2])  # EXACT integer parity


def test_ms_roundtrip_tracks_the_signal():
    from kmeanwithmapreduce_spark.functions.wav import encode_wav_ms

    sig = _signal(2000, 1, seed=5)
    _, _, out = decode_wav(encode_wav_ms(sig))
    s = sig.astype(np.float64).ravel()
    o = out.astype(np.float64).ravel()
    err = np.sqrt(((s - o) ** 2).mean())
    rms = np.sqrt((s ** 2).mean())
    assert err < 0.35 * rms  # 4-bit adaptive: tracks, never exact


def test_ms_truncated_final_block_and_corrupt_header():
    from kmeanwithmapreduce_spark.functions.wav import (
        _ms_decode_blocks,
        encode_wav_ms,
    )

    sig = _signal(600, 1, seed=17)
    wav = encode_wav_ms(sig, block_align_per_ch=256)
    pos, pcm = 12, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        (length,) = struct.unpack_from("<I", wav, pos + 4)
        if tag == b"data":
            pcm = wav[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
    # frames/block = 2 + (256-7)*2 = 500 -> 2 blocks for 600 frames
    assert pcm is not None and len(pcm) == 2 * 256
    full = _ms_decode_blocks(pcm, 1, 256, None)
    cut = pcm[: 256 + 7 + 5]  # header + 5 data bytes = 2 + 10 samples
    part = _ms_decode_blocks(cut, 1, 256, None)
    assert part.shape[0] == 500 + 12
    assert np.array_equal(part, full[: part.shape[0]])
    with pytest.raises(ValueError, match="final block"):
        _ms_decode_blocks(pcm[: 256 + 3], 1, 256, None)
    bad = bytearray(pcm)
    bad[0] = 9  # predictor index out of range
    with pytest.raises(ValueError, match="predictor"):
        _ms_decode_blocks(bytes(bad), 1, 256, None)


def test_ms_routes_through_multimodal_real_path(spark):
    from kmeanwithmapreduce_spark.functions.wav import encode_wav_ms
    from kmeanwithmapreduce_spark.operators.multimodal import (
        decode_audio_batch,
    )

    sig = _signal(500, 2, seed=21)
    wav = encode_wav_ms(sig, 44_100)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    (row,) = decode_audio_batch(df).collect()
    assert (row.sample_rate, row.n_channels, row.n_frames) == (44_100, 2, 500)
