"""Baseline JPEG (ITU-T T.81 / ISO 10918-1, SOF0/SOF1) codec in pure
numpy + stdlib — the sixth REAL codec class of the multimodal
pipeline (see `multimodal.py`; the aduana reference has no media
pipeline — this extends the LLM-data-pipeline operator set).

Scope, honestly labeled (everything else raises NotImplementedError
and degrades to a NULL feature row behind the mapInPandas wrapper,
the same contract as PNG/BMP/GIF/WAV):

- baseline/extended sequential DCT (SOF0/SOF1), 8-bit samples
- grayscale (1 component) and YCbCr (3 components) with sampling
  factors in {1, 2} per axis — 4:4:4, 4:2:2 and 4:2:0 (chroma
  upsampled by replication on decode)
- DRI/RSTn restart intervals (sequence-number verified)
- no progressive (SOF2), no arithmetic coding, no 16-bit DQT, no
  sampling factors > 2, no multi-scan

The encoder exists so tests and `synthesize_media` can fabricate
deterministic JPEG payloads without Pillow: standard Annex K Huffman
tables, a caller-supplied quantization table (default all-ones —
near-lossless, and *integer-exact* for constant-color images: a flat
block's FDCT is DC-only with S00 = 8·(v-128) an exact integer, and
the RGB→YCbCr transform is exact for r=g=b, so constant gray-RGB
JPEGs round-trip bit-exactly — the property the driver's
`media_decode` oracle value-checks in closed form).

Scale note: Huffman entropy decode is inherently serial per scan
(restart intervals are the standard's own parallelism seam — each
RSTn segment resets the DC predictors and byte-aligns, so segments
are independently decodable; this decoder processes them in order),
so the inner loop is per-symbol Python — the honest swap-in point
for libjpeg-turbo via Pillow at production scale. Everything after
entropy decode (dequant, IDCT, level shift, upsample, color
convert) is vectorized numpy over all blocks at once. Rows still
batch through Arrow in `extract_media_features`; no per-row Python
enters any Spark plan.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants -------------------------------------------------------


def _zigzag_pairs() -> list:
    out = []
    for s in range(15):
        if s % 2 == 0:  # even anti-diagonal: traverse up-right
            r = min(s, 7)
            while r >= max(0, s - 7):
                out.append((r, s - r))
                r -= 1
        else:
            r = max(0, s - 7)
            while r <= min(s, 7):
                out.append((r, s - r))
                r += 1
    return out


# ZIGZAG[k] = natural (row-major) index of zigzag position k
ZIGZAG = np.array([r * 8 + c for r, c in _zigzag_pairs()], dtype=np.int64)

# Annex K Huffman table specs: (BITS[1..16], HUFFVAL). Any valid
# prefix code works (tables travel in the stream via DHT); these are
# the spec's published typical tables.
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: D[u, x] = c(u)·cos((2x+1)uπ/16)
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    _D[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list, values: list) -> dict:
    """BITS/HUFFVAL → {symbol: (code, length)} via the canonical
    assignment of T.81 Annex C."""
    out: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list, values: list) -> dict:
    """{(length, code): symbol} for the incremental bit-by-bit
    decoder (max 16 iterations per symbol)."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


# ---- bit I/O ---------------------------------------------------------


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (0xFF → 0xFF00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def align(self) -> None:
        """Pad the current byte with 1-bits (T.81 B.2.1 fill bits) —
        the byte-alignment restart markers require."""
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)

    def put_marker(self, marker: int) -> None:
        """Emit a raw marker (no stuffing) — caller must align() first."""
        self.out += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over an entropy-coded segment; un-stuffs
    0xFF00 and refuses unexpected in-scan markers."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan"
                    )
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, n: int) -> None:
        """Consume an RSTn marker: drop fill bits to the byte
        boundary, expect 0xFFD0+n (T.81 F.2.1.3.1). The modulo-8
        sequence number is verified — a skipped or doubled restart
        means the scan lost sync."""
        self._n = 0  # byte-align: discard remaining fill bits
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG entropy stream truncated at restart")
        b0, b1 = self.data[self.pos], self.data[self.pos + 1]
        if b0 != 0xFF or b1 != 0xD0 + (n % 8):
            raise ValueError(
                f"expected RST{n % 8} marker, found 0x{b0:02X}{b1:02X}"
            )
        self.pos += 2


def _read_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t raw bits back to a signed
    coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---- per-block entropy coding (shared by encoder and decoder) --------


def _encode_block_zz(
    zz: np.ndarray, dc_pred: int, dc_codes: dict, ac_codes: dict,
    w: _BitWriter,
) -> int:
    """Entropy-encode one quantized block (64 coeffs in zigzag
    order); returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - dc_pred
    t = _category(diff)
    code, length = dc_codes[t]
    w.put(code, length)
    if t:
        w.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL: 16 zeros
            w.put(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, length = ac_codes[0x00]  # EOB
        w.put(code, length)
    return dc


def _decode_block_zz(
    r: _BitReader, dc_pred: int, dc_tab: dict, ac_tab: dict
) -> tuple:
    """Decode one block; returns (zigzag coeff array, new DC pred)."""
    zz = np.zeros(64, dtype=np.int32)
    t = _read_symbol(r, dc_tab)
    dc = dc_pred + _extend(r.bits(t), t)
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _read_symbol(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC run overflows block")
        zz[k] = _extend(r.bits(size), size)
        k += 1
    return zz, dc


# ---- encoder ---------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.round(np.stack([y, cb, cr], axis=-1)), 0, 255
    )


def _ycbcr_to_rgb(planes: np.ndarray) -> np.ndarray:
    y, cb, cr = (planes[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# (horizontal factor, vertical factor) of the LUMA component; chroma
# is always 1x1 — the universal convention (4:2:0 means Y sampled 2x2
# per chroma sample)
_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-average downsample by (fv, fh) with edge padding to full
    boxes — exact for constant planes (the oracle's color family)."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fv) * fv, -(-w // fh) * fh
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dht_payload(cls: int, tid: int, spec: tuple) -> bytes:
    bits, values = spec
    return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)


def encode_jpeg(
    arr: np.ndarray,
    quant=1,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder: (H, W) uint8 grayscale or
    (H, W, 3) uint8 RGB as YCbCr with ``subsampling`` in
    {"4:4:4", "4:2:2", "4:2:0"} (chroma box-averaged — exact for
    constant planes). ``quant`` is a scalar or a 64-entry table in
    NATURAL order applied to every component (default all-ones:
    near-lossless, integer-exact for constant images — see module
    docstring). ``restart_interval`` > 0 emits a DRI segment and an
    RSTn marker every that-many MCUs (T.81 F.1.2.3) — the structure
    real encoders use for error resilience, here mostly so the
    decoder's restart path has a stdlib-only test generator."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg takes uint8 samples")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg takes (H, W) gray or (H, W, 3) RGB")
    h, w = arr.shape[:2]
    if not (0 < h < 65536 and 0 < w < 65536):
        raise ValueError("bad JPEG dimensions")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if not 0 <= int(restart_interval) < 65536:
        raise ValueError("restart_interval must be 0..65535")
    restart_interval = int(restart_interval)
    q_nat = (
        np.full(64, int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64).reshape(64)
    )
    if (q_nat < 1).any() or (q_nat > 255).any():
        raise ValueError("quant entries must be 1..255")
    q_zz = q_nat[ZIGZAG]

    if gray:
        samp = [(1, 1)]
        planes = [arr.astype(np.float64)]
    else:
        fh, fv = _SUBSAMPLING[subsampling]
        samp = [(fh, fv), (1, 1), (1, 1)]
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., 0]] + [
            np.round(_downsample(ycc[..., i], fh, fv)) for i in (1, 2)
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    comp_zz: list = []  # quantized zigzag blocks, raster block order
    comp_bx: list = []  # blocks per block-row, per component
    for (fh_i, fv_i), p in zip(samp, planes):
        bx, by = mcus_x * fh_i, mcus_y * fv_i
        ph, pw = p.shape
        p = np.pad(
            p.astype(np.float64),
            ((0, by * 8 - ph), (0, bx * 8 - pw)),
            mode="edge",
        )
        blocks = (
            p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        s = np.einsum("ux,nxy,vy->nuv", _D, blocks - 128.0, _D)
        zz = s.reshape(-1, 64)[:, ZIGZAG]
        comp_zz.append(np.round(zz / q_zz[None, :]).astype(np.int64))
        comp_bx.append(bx)

    dc_specs = [_DC_LUM] + ([_DC_CHR, _DC_CHR] if not gray else [])
    ac_specs = [_AC_LUM] + ([_AC_CHR, _AC_CHR] if not gray else [])
    dc_codes = [_canonical_codes(*s) for s in dc_specs]
    ac_codes = [_canonical_codes(*s) for s in ac_specs]

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_n = rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.align()
                bw.put_marker(0xD0 + rst % 8)
                rst += 1
                preds = [0] * len(planes)
            for ci, (fh_i, fv_i) in enumerate(samp):
                for byi in range(fv_i):
                    for bxi in range(fh_i):
                        n = (my * fv_i + byi) * comp_bx[ci] + mx * fh_i + bxi
                        preds[ci] = _encode_block_zz(
                            comp_zz[ci][n],
                            preds[ci],
                            dc_codes[ci],
                            ac_codes[ci],
                            bw,
                        )
            mcu_n += 1

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q_zz))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        fh_i, fv_i = samp[cid - 1]
        sof += bytes([cid, (fh_i << 4) | fv_i, 0])  # quant table 0
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_payload(0, 0, _DC_LUM))
    out += _seg(0xC4, _dht_payload(1, 0, _AC_LUM))
    if not gray:
        out += _seg(0xC4, _dht_payload(0, 1, _DC_CHR))
        out += _seg(0xC4, _dht_payload(1, 1, _AC_CHR))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        tid = 0 if cid == 1 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to uint8 (H, W) gray or (H, W, 3) RGB.
    Supports interleaved single-scan streams with per-component
    sampling factors in {1, 2} — 4:4:4, 4:2:2 and 4:2:0 chroma
    subsampling (the formats real-world encoders emit) — and
    DRI/RSTn restart intervals. Chroma planes are upsampled by pixel
    replication (libjpeg's "fancy" triangle filter is a smoothing
    choice, not part of the standard; replication is exact for the
    constant images the oracle checks). Raises ValueError on
    non-JPEG/corrupt bytes and NotImplementedError on out-of-scope
    variants (progressive, arithmetic, 16-bit DQT, sampling factors
    > 2, multi-scan) — the mapInPandas wrapper degrades both to NULL
    rows."""
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qtabs: dict = {}
    htabs: dict = {}
    comps: list = []
    h = w = 0
    dri = 0
    scan: bytes = b""
    scan_specs: list = []
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn
            continue
        if pos + 2 > len(content):
            raise ValueError("JPEG segment truncated")
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit DQT out of scope"
                    )
                qtabs[tq] = np.frombuffer(
                    seg[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                htabs[(cls, tid)] = _decode_table(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(
                    f"{prec}-bit JPEG out of scope"
                )
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG out of scope"
                )
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors ({ch},{cv}) out of scope"
                    )
                comps.append({"id": cid, "tq": tq, "h": ch, "v": cv})
            if ncomp == 1 and (comps[0]["h"], comps[0]["v"]) != (1, 1):
                # a single-component scan is never interleaved
                # (T.81 A.2.2) — its sampling factors don't matter
                comps[0]["h"] = comps[0]["v"] = 1
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF 0x{marker:02X} (progressive/lossless/"
                "arithmetic) out of scope"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "multi-scan JPEG out of scope"
                )
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                scan_specs.append(
                    (comp, tt >> 4, tt & 0x0F)
                )
            scan = content[pos:]
            break
        # APPn / COM / others: skipped
    if not scan_specs:
        raise ValueError("JPEG has no scan")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-component block grids at that component's own resolution;
    # the interleaved scan always codes whole MCUs (T.81 A.2.3)
    comp_bx = [mcus_x * s[0]["h"] for s in scan_specs]
    comp_by = [mcus_y * s[0]["v"] for s in scan_specs]
    r = _BitReader(scan)
    coeffs = [
        np.zeros((comp_by[ci] * comp_bx[ci], 64), dtype=np.int32)
        for ci in range(len(scan_specs))
    ]
    preds = [0] * len(scan_specs)
    mcu_n = rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_n and mcu_n % dri == 0:
                r.restart(rst)
                rst += 1
                preds = [0] * len(scan_specs)
            for ci, (comp, dc_id, ac_id) in enumerate(scan_specs):
                dc_tab = htabs.get((0, dc_id))
                ac_tab = htabs.get((1, ac_id))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        n = (my * comp["v"] + byi) * comp_bx[ci] + (
                            mx * comp["h"] + bxi
                        )
                        zz, preds[ci] = _decode_block_zz(
                            r, preds[ci], dc_tab, ac_tab
                        )
                        coeffs[ci][n] = zz
            mcu_n += 1
    planes = []
    for ci, (comp, _, _) in enumerate(scan_specs):
        q = qtabs.get(comp["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing DQT")
        nat = np.zeros((coeffs[ci].shape[0], 64), dtype=np.float64)
        nat[:, ZIGZAG] = coeffs[ci] * q[None, :]
        blocks = nat.reshape(-1, 8, 8)
        pix = np.einsum("xu,nuv,yv->nxy", _D.T, blocks, _D.T) + 128.0
        by, bx = comp_by[ci], comp_bx[ci]
        plane = (
            pix.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # crop to this component's own sample dims (T.81 A.1.1),
        # then replicate up to full resolution
        ch = -(-h * comp["v"] // vmax)
        cw = -(-w * comp["h"] // hmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, vmax // comp["v"], axis=0),
            hmax // comp["h"],
            axis=1,
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(planes, axis=-1))
