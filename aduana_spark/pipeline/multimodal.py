"""Multimodal column plumbing: image/audio/video as opaque BINARY +
typed metadata, processed by Arrow-batched ``mapInPandas``.

Decoders, by fidelity:

- ``decoder='real'`` — REAL decode for the formats the environment's
  stdlib can express: PNG (zlib inflate + full filter-0..4 / Paeth
  reconstruction; 8/16-bit gray/RGB/gray+A/RGBA and palette), BMP
  (24-bit BI_RGB), GIF (LZW, interlace, local/global color tables),
  baseline JPEG (SOF0/SOF1 Huffman + DCT, 4:4:4/4:2:2/4:2:0,
  restart intervals — ``jpeg.py``), WAV (PCM via ``wave``) and
  MJPEG-AVI video (RIFF walk + per-frame JPEG — ``avi.py``), with
  real features (per-channel image stats / RMS, zero crossings, FFT
  spectral centroid for audio / frame count, fps, duration, motion
  for video).
  Rows whose codec the environment cannot decode (mp4/ogg/h264 need
  pyav/libsnd, absent here; ditto progressive JPEG) yield
  ``feature = NULL`` instead of killing the job —
  at 10^12 rows a corrupt or exotic blob is data, not an exception;
  filter on ``feature IS NULL`` downstream.
- ``decoder='fake'`` (default) — deterministic features derived from
  the bytes: exercises the Spark-side plumbing (schema, Arrow batch
  shape, partitioning, UDF signature) with zero codec dependencies.
- ``decoder='stub'`` — raises NotImplementedError loudly: marks where
  Pillow/librosa/pyav would plug in for the codecs stdlib cannot do.

Scale note: PNG filter reconstruction is numpy-vectorized where the
recurrence allows it (Sub is a per-lane cumsum mod 256; Up is a
vector add) and a C-speed Python-int loop where it does not
(Average/Paeth carry a left-neighbor dependency with a floor-divide,
which no prefix-scan expresses exactly) — a 100 TB image corpus
would still swap in a SIMD codec (Pillow-SIMD/pyav) behind the same
``mapInPandas`` signature; the plumbing (one Arrow batch in, one
out, no shuffle) is the part that survives the swap.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .avi import decode_avi_mjpeg, encode_avi_mjpeg
from .jpeg import decode_jpeg, encode_jpeg

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# ---- real codecs (stdlib-only: zlib for PNG, wave for PCM WAV) -------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # gray, RGB, palette, G+A, RGBA


def _unfilter_avg(row: list, prev: list, bpp: int) -> None:
    """Average filter reconstruction, in place on Python-int lists.
    The recurrence out[i] = raw[i] + ⌊(out[i-bpp] + up[i]) / 2⌋ mod 256
    carries a left dependency through a floor-divide — not expressible
    as a prefix scan — so the fast exact path is a C-speed int loop
    (plain-list arithmetic is ~6× numpy scalar indexing)."""
    for i in range(bpp):
        row[i] = (row[i] + (prev[i] >> 1)) & 0xFF
    for i in range(bpp, len(row)):
        row[i] = (row[i] + ((row[i - bpp] + prev[i]) >> 1)) & 0xFF


def _unfilter_paeth(row: list, prev: list, bpp: int) -> None:
    """Paeth filter reconstruction, in place on Python-int lists (same
    left-dependency argument as :func:`_unfilter_avg`)."""
    for i in range(bpp):
        row[i] = (row[i] + prev[i]) & 0xFF  # a = c = 0 → pred = b
    for i in range(bpp, len(row)):
        a = row[i - bpp]
        b = prev[i]
        c = prev[i - bpp]
        pp = a + b - c
        pa = pp - a if pp >= a else a - pp
        pb = pp - b if pp >= b else b - pp
        pc = pp - c if pp >= c else c - pp
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        row[i] = (row[i] + pred) & 0xFF


def decode_png(content: bytes) -> np.ndarray:
    """Decode a non-interlaced PNG to an (H, W, C) array:

    - 8-bit gray/RGB/gray+A/RGBA (color types 0/2/4/6) → uint8
    - 8-bit palette (color type 3 + PLTE) → uint8 RGB (expanded)
    - 16-bit gray/RGB/gray+A/RGBA → uint16

    Full filter reconstruction (None/Sub/Up/Average/Paeth, RFC 2083
    §6; filtering is byte-wise with the pixel offset ``bpp``). Sub is
    vectorized as a per-byte-lane cumulative sum mod 256, Up as a
    vector add; Average/Paeth run as C-speed int-list loops (their
    left-neighbor floor-divide recurrence has no exact prefix-scan
    form). Raises ValueError on non-PNG bytes and NotImplementedError
    on variants out of scope (sub-byte palette depths, interlaced,
    16-bit palette)."""
    if len(content) < 8 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat, hdr, palette = 8, [], None, None
    while pos + 8 <= len(content):
        (ln,), typ = struct.unpack(">I", content[pos:pos + 4]), content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (
                interlace != 0
                or ctype not in _PNG_CHANNELS
                or depth not in (8, 16)
                or (ctype == 3 and depth != 8)
            ):
                raise NotImplementedError(
                    f"PNG variant out of scope (depth={depth}, "
                    f"color_type={ctype}, interlace={interlace})"
                )
            hdr = (w, h, ctype, depth)
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, ctype, depth = hdr
    if ctype == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    ch = _PNG_CHANNELS[ctype]
    bpp = ch * (depth // 8)  # filter offset is in BYTES (spec §6.2)
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        row = np.frombuffer(raw, np.uint8, stride, p)
        p += stride
        if f == 0:
            row = row.copy()
        elif f == 1:  # Sub ≡ per-lane prefix sum mod 256 (uint64 cumsum)
            row = (
                row.reshape(w, bpp)
                .astype(np.uint64)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif f == 2:  # Up: uint8 add wraps mod 256 by definition
            row = row + prev
        elif f in (3, 4):
            lst, plst = row.tolist(), prev.tolist()
            (_unfilter_avg if f == 3 else _unfilter_paeth)(lst, plst, bpp)
            row = np.frombuffer(bytes(lst), np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = row
        prev = out[y]
    if ctype == 3:
        idx = out.reshape(h, w)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        return palette[idx]  # (H, W, 3) uint8
    if depth == 16:
        return (
            out.reshape(h, w * ch * 2)
            .view(">u2")
            .astype(np.uint16)
            .reshape(h, w, ch)
        )
    return out.reshape(h, w, ch)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(
    arr: np.ndarray,
    row_filter: int = 0,
    palette: np.ndarray | None = None,
) -> bytes:
    """Minimal PNG encoder:

    - (H, W, C) uint8, C in 1/2/3/4 → 8-bit gray/G+A/RGB/RGBA
    - (H, W, C) uint16 → 16-bit big-endian samples
    - (H, W) uint8 indices + ``palette`` (k, 3) uint8 → color type 3

    ``row_filter`` applies the SAME filter to every scanline (0-4) —
    mainly so tests can exercise every decode reconstruction path with
    known pixels. Filtering is byte-wise with offset ``bpp`` exactly
    as the decoder expects (spec §6.2)."""
    is16 = arr.dtype == np.uint16
    if palette is not None:
        if arr.ndim != 2:
            raise ValueError("palette PNG takes (H, W) index array")
        h, w = arr.shape
        ch, ctype, depth = 1, 3, 8
        flat = arr.reshape(h, w).astype(np.uint8)
        raw_rows = flat
    else:
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, ch = arr.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        depth = 16 if is16 else 8
        if is16:
            raw_rows = (
                arr.astype(">u2").view(np.uint8).reshape(h, w * ch * 2)
            )
        else:
            raw_rows = arr.reshape(h, w * ch).astype(np.uint8)
    bpp = ch * (depth // 8)
    stride = raw_rows.shape[1]
    lines = []
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        row = raw_rows[y]
        if row_filter == 0:
            enc = row
        elif row_filter == 1:
            enc = row.copy()
            enc[bpp:] = (row[bpp:].astype(np.int16) - row[:-bpp]) & 0xFF
        elif row_filter == 2:
            enc = (row.astype(np.int16) - prev) & 0xFF
        elif row_filter == 3:
            enc = row.copy()
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                enc[i] = (int(row[i]) - ((left + int(prev[i])) >> 1)) & 0xFF
        elif row_filter == 4:
            enc = row.copy()
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (int(row[i]) - pred) & 0xFF
        else:
            raise ValueError("row_filter must be 0-4")
        lines.append(bytes([row_filter]) + enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    chunks = [_PNG_SIG, _png_chunk(b"IHDR", ihdr)]
    if palette is not None:
        chunks.append(
            _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
        )
    chunks.append(_png_chunk(b"IDAT", zlib.compress(b"".join(lines))))
    chunks.append(_png_chunk(b"IEND", b""))
    return b"".join(chunks)


# ---- BMP (BITMAPINFOHEADER, uncompressed 24-bit BI_RGB) --------------


def decode_bmp(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER or
    larger header) to (H, W, 3) uint8 RGB. Handles bottom-up (positive
    height) and top-down (negative height) row order and the 4-byte
    scanline padding. Raises ValueError on non-BMP bytes and
    NotImplementedError on BMP variants out of scope (compressed,
    paletted, other bit depths)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP stream")
    data_off = struct.unpack("<I", content[10:14])[0]
    hdr_size = struct.unpack("<I", content[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} out of scope")
    w, h_signed = struct.unpack("<ii", content[18:26])
    planes, bitcount = struct.unpack("<HH", content[26:30])
    compression = struct.unpack("<I", content[30:34])[0]
    if planes != 1 or bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP variant out of scope (planes={planes}, "
            f"bpp={bitcount}, compression={compression})"
        )
    if w <= 0 or h_signed == 0:
        raise ValueError("bad BMP dimensions")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3  # scanlines pad to 4 bytes
    need = data_off + row_bytes * h
    if len(content) < need:
        raise ValueError("BMP pixel payload truncated")
    px = np.frombuffer(content, np.uint8, row_bytes * h, data_off).reshape(
        h, row_bytes
    )[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BI_RGB BMP encoder for (H, W, 3)
    uint8 RGB arrays (bottom-up by default, like most writers)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP encoder takes (H, W, 3) RGB")
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    bgr = arr[:, :, ::-1]
    if not top_down:
        bgr = bgr[::-1]
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixels = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return file_hdr + info + pixels


_GIF_MAGIC = (b"GIF87a", b"GIF89a")
# interlace passes (GIF89a spec, appendix E): rows 0::8, 4::8, 2::4, 1::2
_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_row_order(h: int) -> list:
    """Display-row index of each stream row of an interlaced image."""
    order: list = []
    for start, step in _GIF_INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW (spec 89a appendix F): LSB-first bit packing,
    CLEAR/END control codes, code width mcs+1 growing to a hard 12-bit
    cap. Width bumps AFTER the table entry that fills the current
    width is inserted (the giflib "late change" convention); at 4096
    entries insertion stops until a CLEAR (deferred-clear tolerant).
    Streaming byte-accumulator reader — O(n), no big-int shifting."""
    clear = 1 << mcs
    end_code = clear + 1
    width = mcs + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nacc = 0
    pos = 0
    while len(out) < n_pixels:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            del table[clear + 2 :]
            width = mcs + 1
            prev = None
            continue
        if code == end_code:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt GIF LZW stream")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data short")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """GIF LZW encoder mirroring ``_lzw_decode``'s width timing: a
    code is packed at the CURRENT width, then the width check runs
    against the next free slot as of before this step's insertion
    (classic compress()-derived GIF writer order), then the new
    string is inserted. Emits CLEAR and resets when the table is
    full, so the decoder's 4096-entry cap is actually exercised."""
    clear = 1 << mcs
    end_code = clear + 1
    out = bytearray()
    acc = 0
    nacc = 0
    width = mcs + 1

    def pack(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = clear + 2
    pack(clear)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        pack(table[w])
        if next_code > (1 << width) - 1 and width < 12:
            width += 1
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        else:
            pack(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = clear + 2
            width = mcs + 1
        w = bytes([byte])
    if w:
        pack(table[w])
        if next_code > (1 << width) - 1 and width < 12:
            width += 1
    pack(end_code)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(content: bytes) -> np.ndarray:
    """Minimal stdlib-only GIF decoder: first frame of an 87a/89a
    stream → (H, W, 3) uint8 RGB. Global or local color table,
    interlaced or sequential row order; extensions are skipped.
    Raises ValueError on non-GIF/corrupt bytes (the mapInPandas
    wrapper degrades those rows to NULL, same as PNG/BMP/WAV)."""
    if content[:6] not in _GIF_MAGIC:
        raise ValueError("not a GIF")
    packed = content[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(content[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label then sub-blocks
            pos += 1
            while content[pos]:
                pos += 1 + content[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _, _, w, h, ipacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                content[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        mcs = content[pos]
        pos += 1
        data = bytearray()
        while content[pos]:
            ln = content[pos]
            data += content[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = _lzw_decode(bytes(data), mcs, w * h)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("GIF palette index out of range")
        img = pal[idx].reshape(h, w, 3)
        if ipacked & 0x40:  # interlaced: stream row i is display row order[i]
            disp = np.empty_like(img)
            disp[_gif_row_order(h)] = img
            img = disp
        return img
    raise ValueError("GIF contains no image data")


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Minimal GIF89a encoder: (H, W) uint8 indices + (k, 3) uint8
    palette, genuine LZW compression (table growth, width bumps,
    full-table CLEAR — so roundtrip tests exercise the real decoder
    paths, not a degenerate literal stream)."""
    if indices.ndim != 2:
        raise ValueError("GIF encoder takes (H, W) index array")
    h, w = indices.shape
    bits = max(1, (max(len(palette), 2) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), np.uint8)
    pal[: len(palette)] = palette
    mcs = max(2, bits)
    header = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
        + pal.tobytes()
    )
    rows = indices.astype(np.uint8)
    ipk = 0
    if interlace:
        rows = rows[_gif_row_order(h)]
        ipk = 0x40
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipk)
    lzw = _lzw_encode(rows.ravel().tobytes(), mcs)
    blocks = bytearray([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return header + desc + bytes(blocks) + b"\x3b"


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV via the stdlib ``wave`` module to
    (samples float64 in [-1, 1], shape (n_frames, channels); rate)."""
    with wave_open(content) as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        pcm = np.frombuffer(frames, np.int16).astype(np.float64) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(frames, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM out of scope")
    return pcm.reshape(-1, nch), rate


def wave_open(content: bytes):
    import wave

    return wave.open(io.BytesIO(content), "rb")


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (n, ch)) as a
    16-bit PCM WAV."""
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — pure index
    arithmetic, no codec dependency."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[ys[:, None], xs[None, :]]


def image_features(arr: np.ndarray, dim: int) -> np.ndarray:
    """Real image features: dimensions + per-channel mean/std (0-1
    scaled by the sample dtype's full range, so an 8-bit color c and
    its 16-bit c·257 replication yield the SAME feature) + mean
    luminance, zero-padded/truncated to ``dim``."""
    h, w = arr.shape[:2]
    ch = arr.shape[2] if arr.ndim == 3 else 1
    scale = 65535.0 if arr.dtype == np.uint16 else 255.0
    px = arr.reshape(h * w, ch).astype(np.float64) / scale
    means = px.mean(axis=0)
    stds = px.std(axis=0)
    luma = means[:3].mean() if ch >= 3 else means[0]
    feat = np.concatenate(
        [[float(h), float(w), float(ch), float(luma)], means, stds]
    )
    out = np.zeros(dim, np.float32)
    out[: min(dim, feat.size)] = feat[:dim]
    return out


def audio_features(pcm: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """Real audio features: duration, RMS, zero-crossing rate, FFT
    spectral centroid (Hz / Nyquist) and peak amplitude of the mono
    mix, zero-padded/truncated to ``dim``."""
    mono = pcm.mean(axis=1)
    n = mono.size
    dur = n / float(rate)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    centroid = 0.0
    if n > 1:
        seg = mono[: 1 << 16]  # bounded FFT cost per row
        mag = np.abs(np.fft.rfft(seg))
        freqs = np.fft.rfftfreq(seg.size, 1.0 / rate)
        tot = float(mag.sum())
        if tot > 0:
            centroid = float((freqs * mag).sum() / tot / (rate / 2.0))
    feat = np.array([dur, rms, zcr, centroid, peak])
    out = np.zeros(dim, np.float32)
    out[: min(dim, feat.size)] = feat[:dim]
    return out


def video_features(frames: np.ndarray, fps: float, dim: int) -> np.ndarray:
    """Real video features over decoded (n, H, W, 3) frames: the
    image-feature layout (dims + per-channel mean/std over ALL
    frames' pixels + luminance) in slots 0-9, then n_frames, fps,
    duration and mean inter-frame motion — so the oracle's image
    closed forms apply verbatim to constant-frame videos."""
    n, h, w = frames.shape[:3]
    ch = frames.shape[3] if frames.ndim == 4 else 1
    px = frames.reshape(-1, ch).astype(np.float64) / 255.0
    means = px.mean(axis=0)
    stds = px.std(axis=0)
    luma = means[:3].mean() if ch >= 3 else means[0]
    motion = (
        float(np.abs(np.diff(frames.astype(np.float64), axis=0)).mean())
        / 255.0
        if n > 1
        else 0.0
    )
    dur = n / fps if fps > 0 else 0.0
    feat = np.concatenate(
        [
            [float(h), float(w), float(ch), float(luma)],
            means,
            stds,
            [float(n), float(fps), dur, motion],
        ]
    )
    out = np.zeros(dim, np.float32)
    out[: min(dim, feat.size)] = feat[:dim]
    return out


def _real_decode(content: bytes, dim: int) -> list | None:
    """Dispatch to the stdlib-expressible codecs — by magic bytes, not
    the mime column (a 10^12-row crawl's mime labels lie; the payload
    doesn't). None for codecs the environment cannot decode (or
    corrupt payloads) — those are data, not exceptions."""
    try:
        if content[:8] == _PNG_SIG:
            return image_features(decode_png(content), dim).tolist()
        if content[:2] == b"BM" and len(content) >= 54:
            return image_features(decode_bmp(content), dim).tolist()
        if content[:6] in _GIF_MAGIC:
            return image_features(decode_gif(content), dim).tolist()
        if content[:2] == b"\xff\xd8":
            return image_features(decode_jpeg(content), dim).tolist()
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            pcm, rate = decode_wav(content)
            return audio_features(pcm, rate, dim).tolist()
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            frames, fps = decode_avi_mjpeg(content, max_frames=64)
            return video_features(frames, fps, dim).tolist()
    except Exception:
        # includes NotImplementedError from out-of-scope JPEG
        # variants (progressive/subsampled/arithmetic): data, not
        # an exception, at crawl scale
        return None
    return None  # mp4/ogg/... need pyav/libsnd, absent here


def _fake_decode(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: features are a
    pure function of the bytes."""
    digest = hashlib.sha256(content or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randn(dim).astype(np.float32)


def extract_media_features(
    media: DataFrame, dim: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Feature extraction over a media table (MEDIA_SCHEMA). Arrow
    batches; no shuffle. ``decoder='real'`` decodes PNG/WAV with the
    stdlib codecs above (NULL feature for codecs the environment
    cannot decode); ``decoder='stub'`` raises where Pillow/librosa/
    pyav would plug in; ``decoder='fake'`` is the deterministic
    plumbing exerciser."""
    if decoder not in ("real", "fake", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches):
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "decoding this codec set requires libraries (Pillow/"
                    "librosa/pyav) not present in this environment; use "
                    "decoder='real' for stdlib PNG/WAV or decoder='fake' "
                    "for deterministic plumbing tests"
                )
            if decoder == "real":
                feats = [
                    _real_decode(c, dim) if c is not None else None
                    for c in pdf["content"]
                ]
            else:
                feats = [
                    _fake_decode(c, dim).tolist() if c is not None else None
                    for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    cols = [c for c in ("media_id", "kind", "content") if c in media.columns]
    return media.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (media_id, frame_idx, ts_ms) — the decode of each frame is the
    stubbed step (``extract_frame_features`` is the realized one for
    MJPEG-AVI). Native explode over a computed sequence."""
    from pyspark.sql import functions as F

    frames = F.sequence(
        F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0))
    )
    return (
        media.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_frame_features(
    media: DataFrame,
    every_ms: int = 1000,
    dim: int = 16,
    max_frames: int = 64,
) -> DataFrame:
    """``frame_sample_plan`` realized: decode video rows (MJPEG-AVI
    via ``avi.py``) and emit one row per SAMPLED frame — the frame
    nearest each ``every_ms`` tick, at most ``max_frames`` per video
    — with that frame's ``image_features``. Rows whose codec the
    environment cannot decode produce NO frame rows (filter the
    parent row's NULL feature in ``extract_media_features`` to see
    which). Arrow-batched mapInPandas, no shuffle, same scale shape
    as the other decode paths; at 100 TB the per-frame decode swaps
    to pyav behind this signature."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")

    def run(batches):
        for pdf in batches:
            out: list = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video" or content is None:
                    continue
                try:
                    frames, fps = decode_avi_mjpeg(bytes(content))
                except Exception:
                    continue  # undecodable codec/corrupt: data, not error
                if fps <= 0:
                    fps = 1000.0 / every_ms  # degenerate header: 1/tick
                n = frames.shape[0]
                step_frames = max(1, int(round(fps * every_ms / 1000.0)))
                for k, idx in enumerate(range(0, n, step_frames)):
                    if k >= max_frames:
                        break
                    out.append(
                        (
                            int(mid),
                            int(idx),
                            int(round(idx * 1000.0 / fps)),
                            image_features(frames[idx], dim).tolist(),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_FEATURE_SCHEMA.fields]
            )

    cols = [c for c in ("media_id", "kind", "content") if c in media.columns]
    return media.select(*cols).mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media corpus keyed by ``doc_id``: even ids become
    constant-color images across SIX codec classes (by ``id % 10``,
    with the ``8`` slot split by ``(id // 10) % 2``); odd ids are
    square-wave 16-bit PCM WAVs, except ``id % 10 == 9`` with
    ``(id // 10) % 2 == 1`` which become MJPEG-AVI videos of
    ``2 + id % 3`` constant gray frames at 10 fps (``avi.py`` — the
    constant gray family keeps every frame's JPEG round-trip
    bit-exact, so the video rows share the image rows' closed
    form, plus exact n_frames / fps / duration).

    Image classes — all with the SAME decoded pixels, so the decoded
    features share one closed form while the byte paths differ:

    - ``id % 10 == 0`` — palette PNG (color type 3 + PLTE): indices
      all ``id % 7`` into a 16-entry palette where ONLY that entry
      holds the target color (any index/entry mix-up changes the mean)
    - ``id % 10 == 2`` — 16-bit RGB PNG with samples c·257 (the 8-bit
      replication: c·257/65535 ≡ c/255 exactly, so the feature scale
      contract is value-checked, not just exercised)
    - ``id % 10 == 4`` — 24-bit BI_RGB BMP (bottom-up, padded rows)
    - ``id % 10 == 6`` — GIF89a (LZW + 16-entry color table, same
      single-live-entry trick as the palette PNG; alternating
      interlaced/sequential row order by ``(id // 2) % 2``)
    - ``id % 10 == 8``, ``(id // 10) % 2 == 0`` — 8-bit truecolor
      RGB PNG
    - ``id % 10 == 8``, ``(id // 10) % 2 == 1`` — baseline JPEG
      (3-component, all-ones quant): 4:4:4 when ``(id // 20) % 2
      == 0``, else 4:2:0 with a 2-MCU restart interval — so the
      subsampled-MCU and RSTn decode paths are driver-gated too.
      JPEG rows use the GRAY constant ``(g, g, g)`` with
      ``g = (37·id) % 256``: for ``r = g = b`` the RGB→YCbCr
      transform is exact (Y = g, Cb = Cr = 128), a flat plane's DCT
      is DC-only with an integer DC (and box-averaged constant
      chroma stays constant), and YCbCr→RGB is exact again — the
      one color family where the FULL JPEG pipeline round-trips
      bit-exactly, keeping the oracle's closed form (``jpeg.py``
      module docstring)

    PNG classes cycle ``row_filter = (id // 2) % 5``, so all five
    filter reconstructions run across the corpus. Every decoded
    feature is a closed-form integer function of the id (constant
    color → channel mean = c/255 exactly, std = 0; square wave →
    RMS = peak = v/32768 exactly), which lets an external SQL oracle
    value-check the REAL decode paths end-to-end without being able
    to decode PNG/BMP/GIF/JPEG/WAV itself (driver query
    ``media_decode``)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if did % 2 == 0:
                    h, w = 3 + did % 4, 4 + did % 5
                    color = ((37 * did) % 256, (91 * did) % 256, (53 * did) % 256)
                    arr = np.zeros((h, w, 3), np.uint8)
                    arr[:, :] = color
                    cls = did % 10
                    if cls == 0:
                        idx = did % 7
                        pal = np.arange(16 * 3, dtype=np.uint8).reshape(16, 3)
                        pal = (pal * 19 + 7) % 256  # filler entries
                        pal[idx] = color
                        content = encode_png(
                            np.full((h, w), idx, np.uint8),
                            row_filter=(did // 2) % 5,
                            palette=pal,
                        )
                        mime = "image/png"
                    elif cls == 2:
                        content = encode_png(
                            arr.astype(np.uint16) * 257,
                            row_filter=(did // 2) % 5,
                        )
                        mime = "image/png"
                    elif cls == 4:
                        content = encode_bmp(arr)
                        mime = "image/bmp"
                    elif cls == 6:
                        idx = did % 7
                        pal = np.arange(16 * 3, dtype=np.uint8).reshape(16, 3)
                        pal = (pal * 23 + 11) % 256  # filler entries
                        pal[idx] = color
                        content = encode_gif(
                            np.full((h, w), idx, np.uint8),
                            pal,
                            interlace=bool((did // 2) % 2),
                        )
                        mime = "image/gif"
                    elif (did // 10) % 2 == 1:
                        g = (37 * did) % 256
                        arr[:, :] = (g, g, g)  # gray: exact JPEG path
                        content = encode_jpeg(
                            arr,
                            subsampling=(
                                "4:2:0" if (did // 20) % 2 else "4:4:4"
                            ),
                            restart_interval=2 if (did // 20) % 2 else 0,
                        )
                        mime = "image/jpeg"
                    else:
                        content = encode_png(arr, row_filter=(did // 2) % 5)
                        mime = "image/png"
                    rows.append((did, "image", content, mime, w, h, None))
                elif did % 10 == 9 and (did // 10) % 2 == 1:
                    h, w = 3 + did % 4, 4 + did % 5
                    g = (37 * did) % 256
                    n_frames = 2 + did % 3
                    frames = np.full((n_frames, h, w, 3), g, np.uint8)
                    content = encode_avi_mjpeg(frames, fps=10)
                    rows.append(
                        (did, "video", content, "video/avi", w, h,
                         100 * n_frames)
                    )
                else:
                    ms = 100 + 10 * did  # rate 8000 → n = 8·ms frames
                    v = 1000 + 500 * (did % 60)  # exact int16 code
                    sign = 1.0 - 2.0 * ((np.arange(8 * ms) // 8) % 2)
                    content = encode_wav_pcm16(sign * (v / 32767.0), 8000)
                    rows.append((did, "audio", content, "audio/wav", None, None, ms))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
            )

    # Rebalance narrow inputs BEFORE the encoder UDF: a doc-id list that
    # arrives as one split (e.g. from ``limit(n)``, whose physical plan
    # collapses to a single partition) would otherwise push every
    # encode AND every downstream decode through ONE Python worker
    # while the rest of the host idles (measured on the 2k-row bench
    # corpus: 96% idle, 4.4 s). The shuffle moves only the bare doc_id
    # longs — everything expensive runs post-exchange at full width; a
    # wide input is left untouched.
    from aduana_spark.pipeline.dedup import _rebalance_for_udf

    return _rebalance_for_udf(docs.select("doc_id")).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )
