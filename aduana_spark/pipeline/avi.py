"""MJPEG-in-AVI (RIFF) container codec in pure stdlib + numpy — the
REAL video decode path of the multimodal pipeline (see
``multimodal.py``; the aduana reference has no media pipeline — this
extends the LLM-data-pipeline operator set).

Why MJPEG/AVI: it is the one mainstream *video* format whose every
layer is stdlib-expressible — RIFF is length-prefixed chunk walking
(the same container WAV uses) and each frame is an independent
baseline JPEG, which ``jpeg.py`` already decodes. mp4/h264/vp9 need
real codec libraries (absent here) and stay NULL paths behind the
same dispatch.

Scope, honestly labeled:

- RIFF 'AVI ' with one 'vids' stream; frames in the 'movi' LIST as
  '00dc'/'00db' chunks (optionally inside 'rec ' groups), each a
  baseline JPEG within ``jpeg.decode_jpeg``'s scope
- fps from the stream header's rate/scale (falls back to the main
  header's microseconds-per-frame)
- anything else (non-JPEG frame payloads, audio streams are skipped
  not decoded, ODML extensions ignored) raises ValueError /
  NotImplementedError — the mapInPandas wrapper degrades to NULL

The encoder exists so tests and ``synthesize_media`` can fabricate
deterministic AVI payloads without pyav: minimal spec-valid header
set (avih + strh/strf), one JPEG per frame via ``jpeg.encode_jpeg``
— constant gray frames therefore round-trip bit-exactly end-to-end
(the ``jpeg.py`` exactness family), which is the property the
driver's ``media_decode`` oracle value-checks for the video rows.

Scale note: frames decode independently (MJPEG has no inter-frame
state), so a production swap-in (pyav) parallelizes trivially; here
frames decode in a Python loop inside the same Arrow-batched
``mapInPandas`` the other codecs use — no per-row Python in any
Spark plan.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF chunk
    run; chunks are word-aligned (odd sizes padded by one byte)."""
    pos = start
    while pos + 8 <= end:
        fcc = buf[pos:pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
        payload = pos + 8
        if payload + size > end:
            raise ValueError("AVI chunk overruns its parent")
        yield fcc, payload, size
        pos = payload + size + (size & 1)


def decode_avi_mjpeg(
    content: bytes, max_frames: int | None = None
) -> tuple[np.ndarray, float]:
    """Decode an MJPEG AVI to ``(frames, fps)`` where frames is a
    uint8 (n, H, W, 3) array (grayscale JPEGs are replicated to 3
    channels so a mixed stream stacks). ``max_frames`` bounds decode
    cost per row — at crawl scale you sample frames, not exhaust
    them. Raises ValueError on non-AVI/corrupt bytes and
    NotImplementedError for non-MJPEG streams."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    (riff_size,) = struct.unpack("<I", content[4:8])
    end = min(8 + riff_size, len(content))

    fps = 0.0
    handler_ok = False
    frames: list[np.ndarray] = []

    def walk_hdrl(s: int, e: int) -> None:
        nonlocal fps, handler_ok
        for fcc, p, n in _chunks(content, s, e):
            if fcc == b"LIST" and content[p:p + 4] == b"strl":
                walk_hdrl(p + 4, p + n)
            elif fcc == b"avih" and n >= 4 and fps == 0.0:
                (usec,) = struct.unpack("<I", content[p:p + 4])
                if usec:
                    fps = 1e6 / usec
            elif fcc == b"strh" and n >= 32:
                if content[p:p + 4] != b"vids":
                    continue  # audio/text streams: skipped, not decoded
                handler = content[p + 4:p + 8]
                if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"AVI codec {handler!r} out of scope (MJPEG only)"
                    )
                handler_ok = True
                scale, rate = struct.unpack("<II", content[p + 20:p + 28])
                if scale and rate:
                    fps = rate / scale

    def walk_movi(s: int, e: int) -> None:
        for fcc, p, n in _chunks(content, s, e):
            if fcc == b"LIST" and content[p:p + 4] == b"rec ":
                walk_movi(p + 4, p + n)
                continue
            if fcc[2:4] not in (b"dc", b"db"):
                continue  # non-video chunk (e.g. '01wb' audio)
            if max_frames is not None and len(frames) >= max_frames:
                return
            payload = content[p:p + n]
            if not payload:
                continue  # dropped frame placeholder
            arr = decode_jpeg(payload)
            if arr.ndim == 2:
                arr = np.repeat(arr[:, :, None], 3, axis=2)
            frames.append(arr)

    saw_movi = False
    for fcc, p, n in _chunks(content, 12, end):
        if fcc != b"LIST":
            continue
        kind = content[p:p + 4]
        if kind == b"hdrl":
            walk_hdrl(p + 4, p + n)
        elif kind == b"movi":
            saw_movi = True
            walk_movi(p + 4, p + n)
    if not saw_movi:
        raise ValueError("AVI has no movi list")
    if not handler_ok:
        # headerless streams: accept only if every frame was JPEG
        # (decode_jpeg above already enforced it)
        if not frames:
            raise ValueError("AVI has no video frames")
    if not frames:
        raise ValueError("AVI has no video frames")
    shape0 = frames[0].shape
    if any(f.shape != shape0 for f in frames):
        raise ValueError("AVI frames change dimensions mid-stream")
    return np.stack(frames), float(fps)


def encode_avi_mjpeg(frames, fps: float = 10.0, quant=1) -> bytes:
    """Minimal MJPEG AVI writer: ``frames`` is (n, H, W, 3) uint8 (or
    a list of (H, W, 3) arrays), one baseline JPEG per frame
    (``quant`` forwarded to ``jpeg.encode_jpeg``). Emits a
    spec-valid avih + strh/strf header pair and a flat movi list —
    the structure every AVI reader (including this module's own
    decoder) accepts."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")
    if not fps > 0:
        raise ValueError("fps must be positive")
    payloads = [encode_jpeg(f, quant=quant) for f in frames]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    # rate/scale as an exact integer pair when fps is integral
    scale, rate = (1, int(fps)) if float(fps).is_integer() else (
        1000, int(round(fps * 1000))
    )
    avih = struct.pack(
        "<10I4I",
        int(round(1e6 / fps)), max_bytes * int(round(fps)), 0,
        0x10,  # AVIF_HASINDEX off; 0x10 = AVIF_WASCAPTUREFILE (benign)
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi", 0, 0, 0, 0, scale, rate, 0,
            len(payloads), max_bytes, 0, 0,
        )
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", h * w * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
