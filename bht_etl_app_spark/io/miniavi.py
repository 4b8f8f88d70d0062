"""Minimal pure-stdlib MJPEG-in-AVI reader/writer (RIFF container).

The third real multimodal decode path (VERDICT r3 item #8), following
the ``minixls`` pattern: no external codec library, just the container
format — an AVI file is a RIFF tree, and an MJPEG AVI stores one
complete JPEG per video chunk, so frame extraction is a chunk walk,
not a codec. Reference: the public RIFF/AVI layout
(``RIFF('AVI ' LIST('hdrl' avih strl...) LIST('movi' 00dc...) idx1)``).

- :func:`read_avi_frames` — walk the RIFF tree, return the stream-0
  video chunks (``00dc``/``00db``) in stream order, descending into
  ``rec `` lists where interleaved files nest them.
- :func:`mjpeg_avi_decode` — the ``decode_fn`` for
  ``operators.multimodal.frame_sample``: every-nth frame with its TRUE
  stream index, each validated to be a complete JPEG (SOI..EOI).
- :func:`write_mjpeg_avi` — a minimal valid writer used by tests and
  fixture generators (main header + stream header + BITMAPINFOHEADER
  + movi + idx1).

The reference app has no media handling at all (SURVEY.md §1.1); this
exists for the engine's multimodal extension surface.
"""

from __future__ import annotations

import struct

__all__ = ["read_avi_frames", "mjpeg_avi_decode", "write_mjpeg_avi"]

_JPEG_SOI = b"\xff\xd8"
_JPEG_EOI = b"\xff\xd9"


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for the RIFF chunks
    in buf[start:end]; chunks are word-aligned (odd sizes padded)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError(
                f"truncated RIFF chunk {fourcc!r} at {pos}: "
                f"size {size} exceeds container"
            )
        yield fourcc, payload, size
        pos = payload + size + (size & 1)


def read_avi_frames(content: bytes, stream: int = 0) -> list[bytes]:
    """All video-frame chunk payloads of ``stream`` (default 0) in
    stream order. Accepts ``##dc`` (compressed) and ``##db``
    (uncompressed) chunk types and descends into ``rec `` lists."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    end = min(8 + riff_size, len(content))
    tag = f"{stream:02d}".encode()
    frames: list[bytes] = []

    def walk(start: int, stop: int) -> None:
        for fourcc, payload, size in _chunks(content, start, stop):
            if fourcc == b"LIST":
                list_type = content[payload:payload + 4]
                if list_type in (b"movi", b"rec "):
                    walk(payload + 4, payload + size)
            elif fourcc[:2] == tag and fourcc[2:4] in (b"dc", b"db"):
                frames.append(content[payload:payload + size])

    walk(12, end)
    return frames


def mjpeg_avi_decode(content: bytes, every_n: int = 1) -> list[tuple[int, bytes]]:
    """``decode_fn`` for ``frame_sample``: sample every ``every_n``-th
    video frame of an MJPEG AVI, returning ``(true_stream_index,
    jpeg_bytes)``. Each sampled payload must be a complete JPEG
    (starts with SOI, ends with EOI) — MJPEG stores standalone JPEGs
    per chunk, so anything else means the container lied about its
    codec and we fail loudly rather than emit garbage frames."""
    out: list[tuple[int, bytes]] = []
    for i, frame in enumerate(read_avi_frames(content)):
        if i % every_n:
            continue
        if not (frame.startswith(_JPEG_SOI) and frame.rstrip(b"\x00").endswith(_JPEG_EOI)):
            raise ValueError(f"frame {i} is not a complete JPEG (not MJPEG data?)")
        out.append((i, frame))
    return out


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_mjpeg_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 30,
) -> bytes:
    """Serialize JPEG frames into a minimal valid MJPEG AVI: main
    header (``avih``), one video stream (``strh``/``strf`` with an
    MJPG BITMAPINFOHEADER), ``movi`` frame chunks, and an ``idx1``
    index. Every frame must already be a complete JPEG."""
    for i, f in enumerate(frames):
        if not (f.startswith(_JPEG_SOI) and f.endswith(_JPEG_EOI)):
            raise ValueError(f"frame {i} is not a complete JPEG")
    max_bytes = max((len(f) for f in frames), default=0)
    usec_per_frame = 1_000_000 // max(1, fps)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame,          # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec (approx)
        0,                       # dwPaddingGranularity
        0x10,                    # dwFlags: AVIF_HASINDEX
        len(frames),             # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0, 0, 0,             # flags, priority, language
            0,                   # initial frames
            1, fps,              # scale, rate -> fps
            0, len(frames),      # start, length
            max_bytes,           # suggested buffer
            0xFFFFFFFF,          # quality (default)
            0,                   # sample size (0: varying)
            0,                   # rcFrame (packed zero)
        )
        + struct.pack("<HH", width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi list type tag
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_jpeg(seed: int, size: int = 64) -> bytes:
    """A deterministic JPEG-shaped payload (valid SOI/EOI framing with
    seeded filler) for tests and fixtures — the container layer treats
    frame bytes as opaque, so no pixel codec is needed to exercise the
    RIFF walk with realistic data."""
    import hashlib

    filler = b""
    n = 0
    while len(filler) < size:
        filler += hashlib.md5(f"{seed}:{n}".encode()).digest()
        n += 1
    # avoid accidental EOI markers inside the body
    body = filler[:size].replace(b"\xff", b"\x7f")
    return _JPEG_SOI + body + _JPEG_EOI
