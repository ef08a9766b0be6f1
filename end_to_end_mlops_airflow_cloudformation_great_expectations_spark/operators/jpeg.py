"""From-scratch baseline JPEG codec (SURVEY.md §2.11 round-4 note;
VERDICT r03 item 7 — the explicit decision to close the compressed-
codec seam one format past PNG).

Everything here is written from the public JPEG specification
(ITU-T T.81 / ISO 10918-1) and the JFIF container note, in this
repo's numpy idiom — no third-party codec, no lifted code. Scope is
baseline sequential DCT, 8-bit precision, 1 or 3 components, with
Hi/Vi in {1,2} (4:4:4 and the ubiquitous 4:2:0 chroma subsampling)
and restart-marker intervals — exactly what the paired encoder below
emits. Progressive scans, arithmetic coding, and 16-bit quant tables
raise cleanly.

The pair exists for the same reason as ``_build_bmp``/``_build_png``
in :mod:`.multimodal`: the container lacks PIL/ffmpeg, so test inputs
are synthesized by our own spec-following encoder and the decoder is
verified against (a) the mathematical quantize-roundtrip prediction
and (b) pixel-exact constant blocks where the DCT is trivially exact.
The production seam for real-world JPEGs remains
``multimodal.decode_image_real``.

Spark-side plumbing mirrors the PNG path: bytes travel as a binary
column, decode runs in Arrow-batched ``mapInPandas`` with per-task
memory bounded by batch × image size.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Shared tables (from the T.81 annexes — public constants)
# ---------------------------------------------------------------------------

#: Zig-zag order: index i of this array holds the (row-major) position
#: of the i-th coefficient in scan order (T.81 Figure 5).
ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Standard Huffman table specs (T.81 Annex K.3): (BITS[1..16], HUFFVAL).
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
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
_STD_AC_CHROMA = (
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

#: 8×8 DCT-II basis matrix: dct2(B) = M @ B @ M.T (orthonormal form,
#: matching T.81 A.3.3 up to the 1/4 scale folded into the s(u) terms).
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _cu = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _DCT_M[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huffman_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code generation: value → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient
    (T.81 F.1.2.1.1: negatives encode as value-1 in `size` bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-fill padding


# ---------------------------------------------------------------------------
# Encoder (test-input synthesis, like _build_bmp/_build_png)
# ---------------------------------------------------------------------------


def encode_jpeg(
    img: np.ndarray,
    quant: np.ndarray | int = 1,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an 8-bit image as baseline JFIF JPEG.

    ``img``: (H, W) grayscale or (H, W, 3) RGB, uint8, with H and W
    multiples of 8 (multiples of 16 for 4:2:0 — no partial-MCU
    padding; the synthetic fixtures control their own dims).
    ``quant``: an 8×8 table or a scalar (scalar 1 → near-lossless,
    handy for pixel-level oracles). ``subsample``: "444" (Hi=Vi=1
    everywhere) or "420" (luma 2×2, chroma boxes averaged 2×2 — the
    near-universal camera/web layout). ``restart_interval``: emit a
    DRI segment and an RSTm marker every N MCUs (DC predictors
    reset), 0 = none.
    """
    if img.dtype != np.uint8:
        raise ValueError("expected uint8 image")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsample {subsample!r}")
    sub420 = subsample == "420" and not gray
    if sub420:
        if h % 16 or w % 16:
            raise ValueError("4:2:0 dims must be multiples of 16")
    elif h % 8 or w % 8:
        raise ValueError("dims must be multiples of 8")
    q = (
        np.full((8, 8), int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64).reshape(8, 8)
    )

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r = img[..., 0].astype(np.float64)
        g = img[..., 1].astype(np.float64)
        b = img[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        if sub420:
            # 2×2 box average (the standard decimation filter)
            planes[1:] = [
                pl.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
                for pl in planes[1:]
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0/JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HBB", 1, 1, 0)[1:] + b"\x01\x00\x00"
    # DQT (table 0; chroma reuses it — legal, simplifies the fixture)
    zz_q = q.ravel()[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in zz_q)
    # SOF0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        hi, vi = samp[cid - 1]
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, 0)  # Tq=0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DRI (restart interval in MCUs)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # DHT: DC0/AC0 (+ DC1/AC1 for chroma)
    tables = [(0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA)]
    if not gray:
        tables += [(0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)]
    for tc_th, (bits, vals) in tables:
        seg = bytes([tc_th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    # SOS
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        td_ta = 0x00 if cid == 1 else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_huffman_codes(*_STD_DC_LUMA)] + (
        [] if gray else [_huffman_codes(*_STD_DC_CHROMA)] * 2
    )
    ac_codes = [_huffman_codes(*_STD_AC_LUMA)] + (
        [] if gray else [_huffman_codes(*_STD_AC_CHROMA)] * 2
    )

    # Batched transform: every plane's blocks go through ONE stacked
    # 8×8 DCT + quantize + zigzag (numpy per-plane, no per-block numpy
    # overhead); the entropy coder then walks only the NONZERO
    # coefficients of each block (for flat fixture blocks that is just
    # the DC — the old dense 64-iteration Python loop per block
    # dominated encode time).
    nbx_c, nby_c, zz_planes = [], [], []
    for plane in planes:
        ph, pw = plane.shape
        nby_c.append(ph // 8)
        nbx_c.append(pw // 8)
        blocks = (
            (plane - 128.0)
            .reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coef = np.matmul(np.matmul(_DCT_M, blocks), _DCT_M.T)
        qc = np.round(coef / q).astype(np.int64)
        zz_planes.append(qc.reshape(-1, 64)[:, ZIGZAG])

    def _encode_block(bw, ci, zz, pred):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, mag = _magnitude(diff)
        code, length = dc_codes[ci][size]
        bw.put(code, length)
        if size:
            bw.put(mag, size)
        # AC: visit only nonzero coefficients; runs from index gaps
        nz = np.flatnonzero(zz[1:]) + 1
        prev = 0
        for k in nz:
            run = int(k) - prev - 1
            prev = int(k)
            while run > 15:
                code, length = ac_codes[ci][0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            size, mag = _magnitude(int(zz[k]))
            code, length = ac_codes[ci][(run << 4) | size]
            bw.put(code, length)
            bw.put(mag, size)
        if prev < 63:
            code, length = ac_codes[ci][0x00]  # EOB
            bw.put(code, length)

    # Interleaved MCU scan (T.81 A.2.3): an MCU carries Hi×Vi blocks
    # per component; 4:4:4 degenerates to one block each, which keeps
    # the 444 byte stream identical to the pre-subsampling encoder.
    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    mcux, mcuy = w // (8 * hmax), h // (8 * vmax)
    bw = _BitWriter()
    pred = [0] * len(planes)
    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                bw.flush()  # byte-align before the marker
                bw.buf += bytes(
                    [0xFF, 0xD0 + ((count // restart_interval - 1) % 8)]
                )
                pred = [0] * len(planes)
            for ci, (hi, vi) in enumerate(samp):
                for v in range(vi):
                    for hh in range(hi):
                        bidx = (my * vi + v) * nbx_c[ci] + (mx * hi + hh)
                        _encode_block(bw, ci, zz_planes[ci][bidx], pred)
            count += 1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> int:
        """Byte-align, consume an RSTm marker, return m (T.81 E.1.2:
        restart markers sit on byte boundaries between entropy runs;
        remaining pad bits of the previous run are discarded)."""
        self._n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        m = self.data[self.pos + 1] & 0x07
        self.pos += 2
        return m


def _decode_huffman(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    if v < (1 << (size - 1)):  # negative branch (T.81 F.2.2.1 EXTEND)
        v -= (1 << size) - 1
    return v


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode baseline JPEG → (width, height, n_components, pixels).

    ``pixels`` is (H, W) for grayscale or (H, W, 3) RGB uint8.
    Validates markers, rebuilds Huffman tables from DHT, entropy-
    decodes interleaved MCUs (Hi/Vi ∈ {1,2} — 4:4:4 and 4:2:0 chroma
    subsampling, with chroma upsampled by sample replication), honors
    DRI restart intervals (predictor reset + RSTm sequence check),
    dequantizes, inverse-zigzags, IDCTs, and converts YCbCr→RGB.
    Raises ValueError on anything outside this baseline profile
    (progressive, arithmetic coding, 16-bit quant tables, Hi/Vi > 2).
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, Hi, Vi, tq)
    restart_interval = 0
    w = h = 0
    scan: list[tuple[int, int, int]] = []  # (comp index, td, ta)
    data_start = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    seg[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                quant[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                # (length, code) → value for the decoder
                dec: dict[tuple[int, int], int] = {}
                code = 0
                k = 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        dec[(length, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = dec
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"sampling {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(
                    j for j, (cid, *_rest) in enumerate(comps) if cid == cs
                )
                scan.append((idx, tdta >> 4, tdta & 0xF))
            data_start = pos + seglen
            break
        pos += seglen
    if data_start is None or not comps:
        raise ValueError("missing SOS/SOF")

    # entropy data runs until EOI (RSTm markers inside are consumed
    # at the restart boundaries below)
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    br = _BitReader(payload[data_start:end])

    # Entropy scan fills integer coefficient rows per (component,
    # block); the float work — dequant, inverse zigzag, IDCT — runs
    # ONCE per component over the stacked blocks afterwards (same
    # per-block arithmetic, batched np.matmul instead of per-block
    # numpy allocations).
    ncomp = len(comps)
    hmax = max(hi for (_, hi, _, _) in comps)
    vmax = max(vi for (_, _, vi, _) in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = [(mcuy * vi, mcux * hi) for (_, hi, vi, _) in comps]
    zz_all = [
        np.zeros((gy * gx, 64), dtype=np.int64) for gy, gx in grids
    ]
    tbls = [(huff[(0, td)], huff[(1, ta)]) for (_, td, ta) in scan]
    pred = [0] * ncomp

    def _decode_block(zz, dc_tbl, ac_tbl, ci):
        size = _decode_huffman(br, dc_tbl)
        pred[ci] += _receive_extend(br, size)
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _decode_huffman(br, ac_tbl)
            run, size = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _receive_extend(br, size)
            k += 1

    count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and count and count % restart_interval == 0:
                m = br.restart()
                if m != (count // restart_interval - 1) % 8:
                    raise ValueError(
                        f"restart marker out of sequence (RST{m})"
                    )
                pred = [0] * ncomp
            for si, (ci, _, _) in enumerate(scan):
                _, hi, vi, _ = comps[ci]
                dc_tbl, ac_tbl = tbls[si]
                gx = grids[ci][1]
                for v in range(vi):
                    for hh in range(hi):
                        bidx = (my * vi + v) * gx + (mx * hi + hh)
                        _decode_block(zz_all[ci][bidx], dc_tbl, ac_tbl, ci)
            count += 1

    planes = []
    for ci in range(ncomp):
        _, hi, vi, tq = comps[ci]
        gy, gx = grids[ci]
        nb = gy * gx
        qz = quant[tq].ravel()[ZIGZAG].astype(np.float64)
        coef = np.zeros((nb, 64), dtype=np.float64)
        coef[:, ZIGZAG] = zz_all[ci] * qz
        blocks = (
            np.matmul(np.matmul(_DCT_M.T, coef.reshape(nb, 8, 8)), _DCT_M)
            + 128.0
        )
        plane = (
            blocks.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        )
        # upsample subsampled components by sample replication
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        planes.append(plane[:h, :w])

    if ncomp == 1:
        px = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    px = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, px


# ---------------------------------------------------------------------------
# Spark plumbing (mirrors the PNG/BMP paths)
# ---------------------------------------------------------------------------

JPEG_META_SCHEMA = (
    "doc_id long, width long, height long, n_components long, "
    "px_tl_r long, px_tl_g long, px_tl_b long, "
    "px_br_r long, px_br_g long, px_br_b long"
)


def _build_jpeg(doc_id: int) -> bytes:
    """Deterministic 16×16 RGB fixture for doc_id: four flat 8×8-
    aligned quadrant colors (flat blocks quantize exactly at q=1, so
    corner pixels are SQL-predictable: see the companion oracle)."""
    d = int(doc_id)
    tl = ((d * 37) % 200 + 20, (d * 59) % 200 + 20, (d * 83) % 200 + 20)
    br = ((d * 101) % 200 + 20, (d * 131) % 200 + 20, (d * 151) % 200 + 20)
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:8, :8] = tl
    img[8:, 8:] = br
    img[:8, 8:] = (tl[0], br[1], tl[2])
    img[8:, :8] = (br[0], tl[1], br[2])
    return encode_jpeg(img, quant=1)


def _build_jpeg420(doc_id: int) -> bytes:
    """Deterministic 32×32 RGB fixture for doc_id, encoded 4:2:0 with
    a restart marker after every MCU (restart_interval=1 → 3 RSTm
    markers across the 4 MCUs, so the decoder's predictor-reset and
    RST sequence check are on the hot path, not just parsed). Flat
    16×16-aligned quadrants: luma blocks are flat, AND the 2×2 box
    downsample maps each quadrant to a flat 8×8 chroma block, so every
    block in every component is a pure DC coefficient at q=1 and the
    corner pixels stay SQL-predictable exactly as in the 4:4:4
    fixture. Exactness is measured, not hoped: decode(encode(img)) ==
    img for ALL pixels over doc_ids 0..4999 (the flat-block pre-
    rounding error is ≤1/16 per plane sample — DC quantization — and
    ≤~0.2 px after the YCbCr→RGB matrix, margin ≥0.3 to the rounding
    boundary; pinned in tests)."""
    d = int(doc_id)
    tl = ((d * 37) % 200 + 20, (d * 59) % 200 + 20, (d * 83) % 200 + 20)
    br = ((d * 101) % 200 + 20, (d * 131) % 200 + 20, (d * 151) % 200 + 20)
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[:16, :16] = tl
    img[16:, 16:] = br
    img[:16, 16:] = (tl[0], br[1], tl[2])
    img[16:, :16] = (br[0], tl[1], br[2])
    return encode_jpeg(img, quant=1, subsample="420", restart_interval=1)


def _jpeg_meta_mapper(builder):
    """Shared mapInPandas runner for the JPEG fixture paths (444 and
    420 differ only in the byte builder)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import _meta_frame

        for pdf in it:
            metas = []
            for d in pdf["doc_id"]:
                w, h, nc, px = decode_jpeg(builder(int(d)))
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "n_components": nc,
                        "px_tl_r": int(px[0, 0, 0]),
                        "px_tl_g": int(px[0, 0, 1]),
                        "px_tl_b": int(px[0, 0, 2]),
                        "px_br_r": int(px[h - 1, w - 1, 0]),
                        "px_br_g": int(px[h - 1, w - 1, 1]),
                        "px_br_b": int(px[h - 1, w - 1, 2]),
                    }
                )
            yield _meta_frame(metas, pdf["doc_id"].values, JPEG_META_SCHEMA)

    return run


def jpeg420_metadata(docs):
    """mapInPandas twin of :func:`jpeg_metadata` over the 4:2:0 +
    restart-interval fixture — same decode path, plus chroma
    upsampling and RSTm handling exercised per row. Parallelism
    widening as in jpeg_metadata (narrow id-only scan)."""
    from .. import catalog as _catalog

    ids = _catalog.spread_narrow(docs.select("doc_id"))
    return ids.mapInPandas(_jpeg_meta_mapper(_build_jpeg420), JPEG_META_SCHEMA)


def jpeg_metadata(docs):
    """mapInPandas: synthesize JPEG bytes per doc, decode end-to-end
    (marker walk → Huffman → dequant → IDCT → YCbCr), emit header
    fields + top-left and bottom-right pixels.

    The decode is CPU-bound per row (~1.6 ms Python/numpy), so
    parallelism = input partitions. The synthetic path feeds a tiny
    id-only table that parquet reads as ONE split (measured: 9.9 s on
    one core vs 1.6 s spread at sf0.1), so widen it to the session's
    core count when the scan is narrower — an 8-byte-row shuffle. At
    production scale a real binary-image scan is already wide and the
    condition is false."""
    from .. import catalog as _catalog

    ids = _catalog.spread_narrow(docs.select("doc_id"))
    return ids.mapInPandas(_jpeg_meta_mapper(_build_jpeg), JPEG_META_SCHEMA)
