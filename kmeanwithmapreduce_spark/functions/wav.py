"""Pure-stdlib WAV (RIFF/PCM) codec: the REAL audio-decode kernel for
the multimodal plumbing, the functions/png.py move applied to audio.

WAV needs no codec library — it is a RIFF container (chunked, little-
endian) around raw PCM samples. This module implements:

- ``decode_wav(data) -> (sample_rate, n_channels, samples)`` for
  16-bit integer PCM (format tag 1), any channel count/sample rate.
  Compressed formats (mu-law, ADPCM, MP3-in-WAV) and other bit depths
  raise a clear ValueError — those stay on the labeled-fake path in
  operators/multimodal.py, as does video.
- ``encode_wav(samples, sample_rate)`` — the matching encoder (used by
  the m05 registry entry and tests to synthesize valid WAVs so the
  decode is value-verified against the DuckDB oracle).

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


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PCM WAV to (sample_rate, n_channels, int16 array
    (n_frames, n_channels)). 16-bit integer PCM only — compressed
    formats and other depths raise ValueError (the multimodal operator
    keeps those on its disclosed fake path)."""
    if data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}): this "
            "stdlib decoder handles 16-bit integer PCM only"
        )
    n_frames = len(pcm) // (channels * 2)
    samples = np.frombuffer(
        pcm, dtype="<i2", count=n_frames * channels
    ).reshape(n_frames, channels)
    return sample_rate, channels, samples
