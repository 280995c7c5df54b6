"""Pure-stdlib AVI codec: UNCOMPRESSED RGB ('DIB ' fourcc) and, since
round 9, MJPEG ('MJPG' — each frame a baseline JPEG decoded by
functions/jpeg.py, the most common compressed AVI payload of the
format's era). Other compressed codecs (H.264 etc.) stay on the
labeled fake; every modality has a real, spec-shaped decode path.

AVI is RIFF like WAV: LIST('hdrl') carries the main header ('avih',
width/height/frame count) and one stream header pair ('strh' video +
'strf' BITMAPINFOHEADER); LIST('movi') carries the frames as '00db'
(uncompressed) / '00dc' (compressed) chunks. Uncompressed frames are
DIB bitmaps with the three classic quirks this codec implements
faithfully (and the tests pin): BOTTOM-UP row order, BGR byte order,
and rows padded to 4 bytes. MJPEG frames are self-contained JPEGs —
top-down, RGB from the JFIF YCbCr transform, variable chunk sizes.

Scale: per-item work inside the Arrow ``mapInPandas`` kernel; the
frame un-padding/flip/BGR swap is numpy slicing, no per-pixel Python,
and the MJPEG path reuses jpeg.py's vectorized-IDCT block kernel.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_TYPE = b"AVI "
# BITMAPINFOHEADER.biCompression for motion-JPEG: the fourcc 'MJPG'
# read as a little-endian uint32
MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _avi_container(
    frame_blobs: list[bytes],
    w: int,
    h: int,
    fps: int,
    fourcc: bytes,
    compression: int,
    chunk_tag: bytes,
) -> bytes:
    """Assemble the RIFF/AVI container around ready frame payloads —
    shared by the DIB and MJPEG encoders (headers differ only in
    fourcc/biCompression/chunk tag)."""
    n = len(frame_blobs)
    bufsize = max((len(b) for b in frame_blobs), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        bufsize * fps,     # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0,                 # dwFlags
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        bufsize,           # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,        # dwReserved
    )
    strh = (
        b"vids" + fourcc + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0,        # flags, priority, language
            0,              # initial frames
            1, fps,         # scale / rate -> fps
            0, n,           # start, length (frames)
            bufsize, 0xFFFFFFFF >> 1, 0,  # bufsize, quality, samplesize
            0, 0, w, h,     # rcFrame
        )
    )
    strf = struct.pack(  # BITMAPINFOHEADER
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, bufsize, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(
        b"movi", b"".join(_chunk(chunk_tag, b) for b in frame_blobs)
    )
    body = AVI_MAGIC_TYPE + hdrl + movi
    return AVI_MAGIC_RIFF + struct.pack("<I", len(body)) + body


def encode_avi_rgb(frames, fps: int = 10) -> bytes:
    """Encode a uint8 array (n_frames, H, W, 3) RGB as an uncompressed
    AVI ('DIB ' stream): bottom-up BGR rows, 4-byte row padding."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_avi_rgb expects (n, H, W, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    bgr = arr[:, ::-1, :, ::-1]  # bottom-up rows, BGR samples
    padded = np.zeros((n, h, row_bytes), dtype=np.uint8)
    padded[:, :, : w * 3] = bgr.reshape(n, h, w * 3)
    return _avi_container(
        [f.tobytes() for f in padded], w, h, fps, b"DIB ", 0, b"00db"
    )


def encode_avi_mjpeg(
    frames,
    fps: int = 10,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """Encode a uint8 array (n_frames, H, W, 3) RGB as a motion-JPEG
    AVI ('MJPG' fourcc): each frame is one self-contained baseline JPEG
    (functions/jpeg.py) in a '00dc' chunk — variable-size, top-down, no
    DIB quirks. Lossy by the JPEG quality knob; the whole pipeline is
    deterministic, so decoded stats are still golden-pinnable."""
    from .jpeg import encode_jpeg

    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_avi_mjpeg expects (n, H, W, 3) RGB")
    blobs = [
        encode_jpeg(arr[i], quality=quality, subsampling=subsampling)
        for i in range(n)
    ]
    return _avi_container(blobs, w, h, fps, b"MJPG", MJPG_FOURCC, b"00dc")


def _walk(data: bytes, pos: int, end: int):
    """Yield (tag, list_type|None, body_start, body_len) over a RIFF
    chunk run."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if tag == b"LIST":
            yield tag, data[start : start + 4], start + 4, length - 4
        else:
            yield tag, None, start, length
        pos = start + length + (length & 1)


def decode_avi_rgb(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode an AVI to (width, height, n_frames, uint8 array
    (n, H, W, 3)): biCompression 0 (BI_RGB/DIB) and 'MJPG' (each frame
    a baseline JPEG via functions/jpeg.py) are REAL; any other
    compression raises ValueError — the multimodal operator keeps those
    on its disclosed fake path.

    Frame geometry is authoritative from the strf BITMAPINFOHEADER
    (biWidth/biHeight — that is what the DIB rows are laid out by),
    cross-checked against the avih dwWidth/dwHeight; a NEGATIVE
    biHeight means TOP-DOWN row order (emitted by some foreign
    encoders) and is honored by skipping the bottom-up flip. MJPEG
    frames are inherently top-down RGB; each decoded frame's geometry
    is cross-checked against the headers."""
    if data[:4] != AVI_MAGIC_RIFF or data[8:12] != AVI_MAGIC_TYPE:
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    avih_w = avih_h = None
    bi_w = bi_h = None
    compression = None
    frames_raw: list[bytes] = []

    def scan(pos: int, end: int) -> None:
        nonlocal avih_w, avih_h, bi_w, bi_h, compression
        for tag, ltype, start, length in _walk(data, pos, end):
            if tag == b"LIST":
                scan(start, start + length)
            elif tag == b"avih":
                fields = struct.unpack_from("<10I", data, start)
                avih_w, avih_h = fields[8], fields[9]
            elif tag == b"strf" and length >= 40:
                bi = struct.unpack_from("<IiiHHI", data, start)
                bi_w, bi_h, compression = bi[1], bi[2], bi[5]
            elif tag in (b"00db", b"00dc"):
                frames_raw.append(data[start : start + length])

    scan(12, len(data))
    if avih_w is None:
        raise ValueError("corrupt AVI: no avih header")
    if bi_w is None:
        raise ValueError("corrupt AVI: no strf BITMAPINFOHEADER")
    if compression not in (0, MJPG_FOURCC):
        raise ValueError(
            f"unsupported AVI (biCompression={compression}): this stdlib "
            "decoder handles uncompressed BI_RGB and MJPG only"
        )
    top_down = bi_h < 0
    width, height = bi_w, abs(bi_h)
    if (width, height) != (avih_w, avih_h):
        raise ValueError(
            f"corrupt AVI: strf frame geometry {width}x{height} disagrees "
            f"with avih {avih_w}x{avih_h}"
        )
    if compression == MJPG_FOURCC:
        from .jpeg import decode_jpeg

        out = np.zeros((len(frames_raw), height, width, 3), dtype=np.uint8)
        for i, raw in enumerate(frames_raw):
            fw, fh, _nc, img = decode_jpeg(bytes(raw))
            if (fw, fh) != (width, height):
                raise ValueError(
                    f"corrupt MJPEG AVI frame {i}: JPEG geometry "
                    f"{fw}x{fh} disagrees with the container "
                    f"{width}x{height}"
                )
            if img.ndim == 2:  # grayscale JPEG inside a color stream
                img = np.stack([img] * 3, axis=-1)
            out[i] = img
        return width, height, len(frames_raw), out
    row_bytes = (width * 3 + 3) & ~3
    out = np.zeros((len(frames_raw), height, width, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        if len(raw) != row_bytes * height:
            raise ValueError(
                f"corrupt AVI frame {i}: {len(raw)} bytes, expected "
                f"{row_bytes * height}"
            )
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, row_bytes)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        if not top_down:
            bgr = bgr[::-1]  # bottom-up DIB: un-flip rows
        out[i] = bgr[:, :, ::-1]  # BGR -> RGB
    return width, height, len(frames_raw), out
