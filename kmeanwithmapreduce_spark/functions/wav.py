"""Pure-stdlib WAV (RIFF/PCM) codec: the REAL audio-decode kernel for
the multimodal plumbing, the functions/png.py move applied to audio.

WAV needs no codec library — it is a RIFF container (chunked, little-
endian) around raw PCM samples. This module implements:

- ``decode_wav(data) -> (sample_rate, n_channels, samples)`` for
  16-bit integer PCM (format tag 1), any channel count/sample rate,
  IMA/DVI ADPCM (round 11, format tag 0x11) — the 4-bit block-coded
  compression from the IMA Digital Audio Pack spec (the algorithm
  Microsoft documents for WAVE_FORMAT_IMA_ADPCM): per-block
  per-channel predictor/step-index header, nibble stream through the
  89-entry step table — AND (round 12) Microsoft ADPCM (format tag
  0x02): per-block per-channel predictor-pair/delta/two-sample
  header, signed nibbles through the 7 standard coefficient pairs and
  the 16-entry delta adaptation table — AND (round 13) ITU-T G.711
  mu-law (tag 0x07) and A-law (tag 0x06) (256-entry companding table
  lookups, byte-exact against CPython's audioop reference), IEEE-float
  WAV (tag 0x03, 32/64-bit, returned at source precision), 24-bit PCM
  (widened losslessly to int32), and 8-bit unsigned PCM (widened to
  int16). Every WAV depth/codec family now decodes for REAL; only
  WAVE_FORMAT_EXTENSIBLE headers still raise ValueError and fall to
  the labeled-fake path in operators/multimodal.py, as does non-MJPEG
  video.
- ``encode_wav(samples, sample_rate)`` — the matching PCM encoder
  (used by the m05 registry entry and tests to synthesize valid WAVs
  so the decode is value-verified against the DuckDB oracle), plus
  ``encode_wav_ima`` and ``encode_wav_ms`` — the matching ADPCM
  encoders (state tracked through the exact decoder rules, a ``fact``
  chunk carrying the exact frame count so padded tails round-trip).

Scale: like PNG decode, per-item work inside the Arrow ``mapInPandas``
kernel; the sample reshape is one numpy frombuffer — no per-sample
Python.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"


def encode_wav(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 array (n,) mono or (n, channels) as PCM WAV."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    data = arr.tobytes()  # interleaved frames, little-endian
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _pcm_container(fmt: bytes, data: bytes, n_frames: int) -> bytes:
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def encode_wav_float(
    samples, sample_rate: int = 16_000, bits: int = 32
) -> bytes:
    """Encode a float array (n,) mono or (n, channels) as an IEEE-float
    WAV (format tag 0x03, 32- or 64-bit). Values pass through at the
    chosen precision — no scaling or clipping."""
    if bits not in (32, 64):
        raise ValueError(f"bits must be 32 or 64, got {bits}")
    arr = np.ascontiguousarray(samples, dtype="<f4" if bits == 32 else "<f8")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    width = bits // 8
    fmt = struct.pack(
        "<HHIIHHH", 0x03, channels, sample_rate,
        sample_rate * channels * width, channels * width, bits, 0,
    )
    return _pcm_container(fmt, arr.tobytes(), n)


def encode_wav_pcm24(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an int array (n,) mono or (n, channels) holding 24-bit
    values (range +-8388607, checked) as 24-bit PCM WAV: 3-byte
    little-endian two's-complement frames."""
    arr = np.ascontiguousarray(samples, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.size and (arr.max() > 8388607 or arr.min() < -8388608):
        raise ValueError("encode_wav_pcm24: values exceed 24-bit range")
    n, channels = arr.shape
    u = arr.astype(np.uint32).ravel()
    data = np.empty((u.size, 3), dtype=np.uint8)
    data[:, 0] = u & 0xFF
    data[:, 1] = (u >> 8) & 0xFF
    data[:, 2] = (u >> 16) & 0xFF
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 3, channels * 3, 24,
    )
    return _pcm_container(fmt, data.tobytes(), n)


def encode_wav_pcm8(samples, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 array as 8-bit UNSIGNED PCM WAV (the RIFF
    convention): the stored byte is ``(x >> 8) + 128`` — the exact
    inverse of decode_wav's ``(b - 128) << 8`` widening for values
    that survive the depth reduction."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    data = ((arr.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    return _pcm_container(fmt, data, n)


# IMA/DVI ADPCM tables (IMA Digital Audio Pack, 1992; reproduced in
# Microsoft's WAVE_FORMAT_IMA_ADPCM documentation — public spec)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_step(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step: (new predictor, new index).
    Shared by decode and encode (the encoder must track the decoder's
    state exactly or the streams drift)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    index += _IMA_INDEX[nibble & 7]
    index = 0 if index < 0 else (88 if index > 88 else index)
    return pred, index


def _ima_decode_blocks(
    pcm: bytes, channels: int, block_align: int
) -> np.ndarray:
    """Decode an IMA ADPCM data chunk to int16 (n_frames, channels).
    Block layout (the canonical WAV one): per channel a 4-byte header
    (int16 predictor == first output sample, step index, reserved),
    then 4-byte data words round-robin across channels, 8 nibbles per
    word, low nibble first. A TRUNCATED final block (legal in real
    files) decodes the headers plus every complete word round it
    carries — a tail too short to even hold the per-channel headers is
    corrupt and raises, so the shortfall never passes silently."""
    out: list[list[int]] = [[] for _ in range(channels)]
    for b0 in range(0, len(pcm), block_align):
        block = pcm[b0 : b0 + block_align]
        if len(block) < 4 * channels:
            raise ValueError(
                f"corrupt IMA ADPCM: final block of {len(block)} bytes "
                f"cannot hold the {4 * channels}-byte channel headers"
            )
        preds, idxs = [], []
        for ch in range(channels):
            (p,) = struct.unpack_from("<h", block, 4 * ch)
            i = block[4 * ch + 2]
            if i > 88:
                raise ValueError(f"corrupt IMA ADPCM: step index {i}")
            preds.append(p)
            idxs.append(i)
            out[ch].append(p)  # header predictor IS the first sample
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for ch in range(channels):
                word = block[pos + 4 * ch : pos + 4 * ch + 4]
                p, i = preds[ch], idxs[ch]
                o = out[ch]
                for byte in word:
                    p, i = _ima_step(byte & 0x0F, p, i)
                    o.append(p)
                    p, i = _ima_step(byte >> 4, p, i)
                    o.append(p)
                preds[ch], idxs[ch] = p, i
            pos += 4 * channels
    n = min(len(o) for o in out) if out else 0
    arr = np.empty((n, channels), dtype=np.int16)
    for ch in range(channels):
        arr[:, ch] = out[ch][:n]
    return arr


# Microsoft ADPCM (WAVE_FORMAT_ADPCM, tag 0x02) tables — public spec
# (Microsoft "Multimedia Programming Interface and Data Specifications"
# / RIFF WAVE ADPCM extension; the 7 standard predictor pairs and the
# delta adaptation table)
_MS_COEFS = [
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
]
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]


def _ms_step(nibble: int, s1: int, s2: int, delta: int, c1: int, c2: int):
    """One MS ADPCM reconstruction step → (sample, new s1, new s2,
    new delta). Pure integer; the predictor divide is TRUNCATION
    toward zero (the spec's C ``/ 256``, what ffmpeg/libsndfile do) —
    round-12 ADVICE: ``>> 8`` floors, which differs by 1 LSB on
    negative coefficient sums and drifts predictor state against
    externally-encoded files. The delta adaptation stays ``>> 8``:
    ``_MS_ADAPT[n] * delta`` is non-negative (delta >= 16), where
    floor == truncate. The signed nibble is two's-complement 4-bit."""
    signed = nibble - 16 if nibble >= 8 else nibble
    acc = s1 * c1 + s2 * c2
    pred = (acc >> 8 if acc >= 0 else -((-acc) >> 8)) + signed * delta
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    delta = (_MS_ADAPT[nibble] * delta) >> 8
    if delta < 16:
        delta = 16
    return pred, pred, s1, delta


def _ms_decode_blocks(
    pcm: bytes, channels: int, block_align: int,
    samples_per_block: int | None,
) -> np.ndarray:
    """Decode an MS ADPCM data chunk to int16 (n_frames, channels).
    Block layout (the spec's): per channel a 7-byte header —
    predictor index (1 B), initial delta (int16), sample1, sample2
    (int16 each), fields grouped field-major across channels — whose
    sample2/sample1 ARE the block's first two output frames; then
    4-bit nibbles, high nibble first, successive samples round-robin
    across channels. Same truncated-final-block discipline as IMA:
    complete data bytes decode, a tail too short for the headers
    raises."""
    hdr = 7 * channels
    out: list[list[int]] = [[] for _ in range(channels)]
    for b0 in range(0, len(pcm), block_align):
        block = pcm[b0 : b0 + block_align]
        if len(block) < hdr:
            raise ValueError(
                f"corrupt MS ADPCM: final block of {len(block)} bytes "
                f"cannot hold the {hdr}-byte channel headers"
            )
        preds, deltas, s1s, s2s = [], [], [], []
        for ch in range(channels):
            p = block[ch]
            if p >= len(_MS_COEFS):
                raise ValueError(f"corrupt MS ADPCM: predictor index {p}")
            preds.append(p)
        for ch in range(channels):
            (d,) = struct.unpack_from("<h", block, channels + 2 * ch)
            deltas.append(d if d >= 16 else 16)
        for ch in range(channels):
            (v,) = struct.unpack_from("<h", block, 3 * channels + 2 * ch)
            s1s.append(v)
        for ch in range(channels):
            (v,) = struct.unpack_from("<h", block, 5 * channels + 2 * ch)
            s2s.append(v)
        blk: list[list[int]] = [[s2s[ch], s1s[ch]] for ch in range(channels)]
        k = 0  # running sample index across the nibble stream
        for byte in block[hdr:]:
            for nib in (byte >> 4, byte & 0x0F):
                ch = k % channels
                c1, c2 = _MS_COEFS[preds[ch]]
                smp, s1s[ch], s2s[ch], deltas[ch] = _ms_step(
                    nib, s1s[ch], s2s[ch], deltas[ch], c1, c2
                )
                blk[ch].append(smp)
                k += 1
        for ch in range(channels):
            # wSamplesPerBlock caps a block that carries padding nibbles
            cap = samples_per_block if samples_per_block is not None else len(
                blk[ch]
            )
            out[ch].extend(blk[ch][:cap])
    n = min(len(o) for o in out) if out else 0
    arr = np.empty((n, channels), dtype=np.int16)
    for ch in range(channels):
        arr[:, ch] = out[ch][:n]
    return arr


def encode_wav_ms(
    samples, sample_rate: int = 16_000, block_align_per_ch: int = 256
) -> bytes:
    """Encode an int16 array (n,) mono or (n, channels) as MS ADPCM
    WAV (format tag 0x02). Deterministic: predictor pair 0 for every
    block/channel, initial delta from the block's mean absolute
    second difference (integer math), quantizer truncates toward zero
    against the decoder-tracked state — every nibble reconstructs
    through the exact ``_ms_step`` rule, so encode→decode round-trips
    track the signal. A ``fact`` chunk records the true frame count
    (the final block is zero-padded)."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if n == 0:
        raise ValueError("encode_wav_ms: need at least one frame")
    if block_align_per_ch < 8:
        raise ValueError(
            f"encode_wav_ms: block_align_per_ch={block_align_per_ch} "
            "must be >= 8 (7-byte header + data)"
        )
    block_align = block_align_per_ch * channels
    data_bytes = block_align - 7 * channels
    frames_per_block = 2 + (2 * data_bytes) // channels
    blocks = bytearray()
    for f0 in range(0, n, frames_per_block):
        chunk = arr[f0 : f0 + frames_per_block]
        if len(chunk) < frames_per_block:
            pad = np.zeros((frames_per_block - len(chunk), channels), "<i2")
            chunk = np.concatenate([chunk, pad])
        s2s = [int(chunk[0, ch]) for ch in range(channels)]
        s1s = [int(chunk[1, ch]) for ch in range(channels)]
        deltas = []
        for ch in range(channels):
            c = chunk[:, ch].astype(np.int64)
            dmean = int(np.abs(np.diff(c)).mean()) if len(c) > 1 else 0
            deltas.append(max(16, dmean >> 2))
        blocks += bytes([0] * channels)  # predictor pair 0 everywhere
        for d in deltas:
            blocks += struct.pack("<h", d)
        for v in s1s:
            blocks += struct.pack("<h", v)
        for v in s2s:
            blocks += struct.pack("<h", v)
        c1, c2 = _MS_COEFS[0]
        nibbles = []
        for fidx in range(2, frames_per_block):
            for ch in range(channels):
                target = int(chunk[fidx, ch])
                acc = s1s[ch] * c1 + s2s[ch] * c2
                pred = acc >> 8 if acc >= 0 else -((-acc) >> 8)
                err = target - pred
                nib = int(err / deltas[ch])  # truncate toward zero
                nib = -8 if nib < -8 else (7 if nib > 7 else nib)
                nib &= 0x0F
                _, s1s[ch], s2s[ch], deltas[ch] = _ms_step(
                    nib, s1s[ch], s2s[ch], deltas[ch], c1, c2
                )
                nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)
        for i in range(0, len(nibbles), 2):
            blocks += bytes([(nibbles[i] << 4) | nibbles[i + 1]])
    byte_rate = (sample_rate * block_align + frames_per_block - 1) // max(
        frames_per_block, 1
    )
    extra = struct.pack("<HH", frames_per_block, len(_MS_COEFS))
    for c1, c2 in _MS_COEFS:
        extra += struct.pack("<hh", c1, c2)
    fmt = struct.pack(
        "<HHIIHHH", 0x02, channels, sample_rate, byte_rate, block_align,
        4, len(extra),
    ) + extra
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


# G.711 mu-law / A-law (format tags 0x07 / 0x06) — ITU-T G.711 is a
# pure 256-entry companding table; both tables are generated here from
# the standard shift formulation (CCITT reference code), and the
# encoders implement the Sun/CCITT 14-bit (mu) / 13-bit (A) reference
# algorithm — byte-exact against CPython's audioop across all 65536
# int16 inputs (pinned in tests/test_wav_g711.py).
_G711_SEG_UEND = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
)
_G711_SEG_AEND = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
)


def _build_g711_tables() -> tuple[np.ndarray, np.ndarray]:
    ulaw = np.empty(256, dtype=np.int16)
    alaw = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
        ulaw[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 0x07
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        alaw[b] = t if (a & 0x80) else -t
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _build_g711_tables()


def _g711_decode(pcm: bytes, channels: int, table: np.ndarray) -> np.ndarray:
    """G.711 data chunk -> int16 (n_frames, channels): one table
    lookup over the whole byte buffer, no per-sample Python."""
    raw = np.frombuffer(pcm, dtype=np.uint8)
    n_frames = len(raw) // channels
    return table[raw[: n_frames * channels]].reshape(n_frames, channels)


def _g711_encode_bytes(arr: np.ndarray, law: str) -> bytes:
    """int16 array -> G.711 bytes, the Sun/CCITT reference algorithm
    vectorized (audioop-byte-exact; >> on negatives floors like C's
    arithmetic shift, exactly as the reference code relies on)."""
    x = arr.astype(np.int32).ravel()
    if law == "mulaw":
        x = x >> 2  # 14-bit domain
        mask = np.where(x < 0, 0x7F, 0xFF)
        x = np.minimum(np.where(x < 0, -x, x), 8159) + 33
        seg = np.searchsorted(_G711_SEG_UEND, x, side="left")
        over = seg >= 8
        seg = np.minimum(seg, 7)
        val = (seg << 4) | ((x >> (seg + 1)) & 0xF)
    elif law == "alaw":
        x = x >> 3  # 13-bit domain
        mask = np.where(x >= 0, 0xD5, 0x55)
        x = np.where(x >= 0, x, -x - 1)
        seg = np.searchsorted(_G711_SEG_AEND, x, side="left")
        over = seg >= 8
        seg = np.minimum(seg, 7)
        val = (seg << 4) | np.where(
            seg < 2, (x >> 1) & 0xF, (x >> seg) & 0xF
        )
    else:
        raise ValueError(f"law must be 'mulaw' or 'alaw', got {law!r}")
    return (np.where(over, 0x7F, val) ^ mask).astype(np.uint8).tobytes()


def encode_wav_g711(
    samples, sample_rate: int = 8_000, law: str = "mulaw"
) -> bytes:
    """Encode an int16 array (n,) mono or (n, channels) as a G.711 WAV
    (format tag 0x07 mu-law / 0x06 A-law, 8 bits per sample, one byte
    per sample so block_align == channels — no padding, no ``fact``
    needed). Deterministic; decode_wav round-trips through the exact
    companding tables."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    tag = 0x07 if law == "mulaw" else 0x06
    data = _g711_encode_bytes(arr, law)  # raises on a bad `law`
    byte_rate = sample_rate * channels
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, sample_rate, byte_rate, channels, 8, 0
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def encode_wav_ima(
    samples, sample_rate: int = 16_000, block_align_per_ch: int = 256
) -> bytes:
    """Encode an int16 array (n,) mono or (n, channels) as IMA ADPCM
    WAV (format tag 0x11). Standard quantizer: sign + three
    successive-approximation bits against the current step, state
    updated through the exact decoder rule. The final partial block is
    zero-padded and a ``fact`` chunk records the true frame count, so
    ``decode_wav`` returns exactly ``n`` frames."""
    arr = np.ascontiguousarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if n == 0:
        raise ValueError("encode_wav_ima: need at least one frame")
    if block_align_per_ch < 8 or (block_align_per_ch - 4) % 4 != 0:
        # 4-byte header + whole 4-byte data words per channel; anything
        # else makes the nibble loop emit more bytes per block than
        # block_align declares, silently misaligning every decoder
        raise ValueError(
            f"encode_wav_ima: block_align_per_ch={block_align_per_ch} "
            "must be >= 8 with (block_align_per_ch - 4) % 4 == 0"
        )
    block_align = block_align_per_ch * channels
    frames_per_block = (block_align - 4 * channels) * 2 // channels + 1
    blocks = bytearray()
    for f0 in range(0, n, frames_per_block):
        chunk = arr[f0 : f0 + frames_per_block]
        if len(chunk) < frames_per_block:  # zero-pad the tail block
            pad = np.zeros((frames_per_block - len(chunk), channels), "<i2")
            chunk = np.concatenate([chunk, pad])
        preds = [int(chunk[0, ch]) for ch in range(channels)]
        idxs = [0] * channels
        for ch in range(channels):
            blocks += struct.pack("<hBB", preds[ch], idxs[ch], 0)
        for w0 in range(1, frames_per_block, 8):
            for ch in range(channels):
                word = 0
                p, i = preds[ch], idxs[ch]
                for k in range(8):
                    fidx = w0 + k
                    s = int(chunk[fidx, ch]) if fidx < frames_per_block else 0
                    step = _IMA_STEPS[i]
                    diff = s - p
                    nib = 0
                    if diff < 0:
                        nib = 8
                        diff = -diff
                    if diff >= step:
                        nib |= 4
                        diff -= step
                    if diff >= step >> 1:
                        nib |= 2
                        diff -= step >> 1
                    if diff >= step >> 2:
                        nib |= 1
                    p, i = _ima_step(nib, p, i)
                    word |= nib << (4 * k)
                preds[ch], idxs[ch] = p, i
                blocks += struct.pack("<I", word)
    byte_rate = (sample_rate * block_align + frames_per_block - 1) // max(
        frames_per_block, 1
    )
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sample_rate, byte_rate, block_align,
        4, 2, frames_per_block,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a WAV to (sample_rate, n_channels, samples
    (n_frames, n_channels)). Sample dtype follows the source format —
    int16 for 16-bit/8-bit PCM and every compressed format (IMA/MS
    ADPCM, G.711), int32 holding true 24-bit values for 24-bit PCM,
    float32/float64 for IEEE-float (tag 3) — so no precision is
    invented or dropped; consumers branch on ``samples.dtype``.
    Unsupported variants (extensible-format headers, other depths)
    raise ValueError (the multimodal operator keeps those on its
    disclosed fake path)."""
    if data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    fmt_body = b""
    pcm = None
    fact_frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif tag == b"data":
            pcm = body
        elif tag == b"fact" and length >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
    if fmt is None or pcm is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, align, bits = fmt
    if audio_format == 0x11 and bits == 4:
        if align < 4 * channels + 4:
            raise ValueError(f"corrupt IMA ADPCM: block align {align}")
        samples = _ima_decode_blocks(pcm, channels, align)
        if fact_frames is not None:  # exact length incl. padded tail
            samples = samples[:fact_frames]
        return sample_rate, channels, samples
    if audio_format == 0x02 and bits == 4:
        if align < 7 * channels + 1:
            raise ValueError(f"corrupt MS ADPCM: block align {align}")
        # WAVEFORMATEX extension: cbSize at offset 16, then
        # wSamplesPerBlock — absent/short extensions decode uncapped
        spb = None
        if len(fmt_body) >= 20:
            (spb,) = struct.unpack_from("<H", fmt_body, 18)
            spb = spb or None
        samples = _ms_decode_blocks(pcm, channels, align, spb)
        if fact_frames is not None:
            samples = samples[:fact_frames]
        return sample_rate, channels, samples
    if audio_format in (0x07, 0x06) and bits == 8:
        table = _ULAW_TABLE if audio_format == 0x07 else _ALAW_TABLE
        samples = _g711_decode(pcm, channels, table)
        if fact_frames is not None:
            samples = samples[:fact_frames]
        return sample_rate, channels, samples
    if audio_format == 0x03 and bits in (32, 64):
        # IEEE-float WAV (round 13): raw little-endian float frames,
        # returned at source precision — no int conversion invented
        width = bits // 8
        dt = "<f4" if bits == 32 else "<f8"
        n_frames = len(pcm) // (channels * width)
        samples = np.frombuffer(
            pcm, dtype=dt, count=n_frames * channels
        ).reshape(n_frames, channels)
        return sample_rate, channels, samples
    if audio_format == 1 and bits == 24:
        # 24-bit PCM (round 13): 3-byte little-endian two's-complement
        # frames, widened losslessly to int32 (range +-8388607)
        n_frames = len(pcm) // (channels * 3)
        b = np.frombuffer(
            pcm, dtype=np.uint8, count=n_frames * channels * 3
        ).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v & 0x800000) << 1  # sign-extend bit 23
        return sample_rate, channels, v.reshape(n_frames, channels)
    if audio_format == 1 and bits == 8:
        # 8-bit PCM is UNSIGNED by the RIFF spec; widen to int16 by
        # the libsndfile convention ((x - 128) << 8) — lossless
        n_frames = len(pcm) // channels
        x = np.frombuffer(
            pcm, dtype=np.uint8, count=n_frames * channels
        ).astype(np.int16)
        return (
            sample_rate,
            channels,
            ((x - 128) << 8).reshape(n_frames, channels),
        )
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}): this "
            "stdlib decoder handles 8/16/24-bit integer PCM, 32/64-bit "
            "IEEE float, IMA ADPCM, MS ADPCM, and G.711 mu-law/A-law only"
        )
    n_frames = len(pcm) // (channels * 2)
    samples = np.frombuffer(
        pcm, dtype="<i2", count=n_frames * channels
    ).reshape(n_frames, channels)
    return sample_rate, channels, samples
