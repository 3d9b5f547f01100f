"""REAL baseline-JPEG codec for binary media columns (stdlib + numpy).

Closes the last honest image-decode gap in the multimodal tier (the
container has no codec libs, so like the PNG/GIF/BMP/WAV siblings the
wire format is implemented, not faked): genuine JFIF byte layout —
SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers, Annex-K luminance quantization
and Huffman tables, zigzag scan, DC DPCM, AC run/size entropy coding
with ZRL/EOB, 0xFF byte stuffing, restart-interval support — plus the
float DCT/IDCT pipeline on both sides. Baseline sequential here;
progressive (SOF2) decodes in :mod:`.image_jpeg_progressive`.

Exactness device for the oracle (JPEG is lossy, so closed-form pixel
parity needs care): the synthetic corpus is built from UNIFORM 8x8
tiles. A constant block's DCT is DC-only (AC exactly zero), so the
decoded tile value is the closed form

    px = clamp(2 * floor((v - 127) / 2) + 128, 0, 255)

(DC = 8*(v-128); quantized by the Annex-K DC step 16 with
floor(x/q + 0.5); dequantized and IDCT'd back to 2*round + 128) —
restatable in SQL with integer arithmetic. Entropy coding is
LOSSLESS over quantized coefficients, so random-image coefficient
round trips pin the Huffman/RLE/stuffing paths exactly
(tests/test_image_jpeg.py); the tile corpus pins the full pixel path.

Kernels are Arrow-batched ``mapInPandas`` like the other codecs.
"""

from __future__ import annotations

import struct
import sys
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

JPEG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_components", LongType()),
        StructField("sum_px", LongType()),
    ]
)

JPEG_BLOB_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
    ]
)


def _register_by_value() -> None:
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_by_value()

# ITU-T T.81 Annex K.1 luminance quantization table (row-major)
QTABLE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

# zigzag scan order: ZIGZAG[k] = row-major index of the k-th scanned
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables (luminance); reused for every
# component — legal, each scan component just selects table 0
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical JPEG order."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)

# orthonormal DCT-II matrix: F = M f M^T, f = M^T F M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """floor(x/q + 0.5 + eps) — one documented deterministic rule for
    both signs (the closed-form tile oracle depends on it). The 1e-7
    epsilon absorbs the DCT's ~1-ulp float error when the TRUE
    coefficient sits exactly on a .5 boundary (a constant tile's DC
    is an exact integer, so 8*(v-128)/16 hits halves routinely).
    Quantization is a design choice, not a spec conformance point —
    any deterministic rule decodes identically everywhere."""
    return np.floor(coef / q + 0.5 + 1e-7).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, surfaces RSTn, stops at
    any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past marker")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise EOFError("marker in entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Consume an expected RSTn marker and resume."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # byte-aligned scan for the marker
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        else:
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, got FF{self.marker:02X}")
        self.marker = None

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, amplitude bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _encode_block(plane: np.ndarray, y0: int, x0: int, pred: int,
                  wtr: _BitWriter, q2d: np.ndarray) -> int:
    """DCT/quantize/entropy-encode one 8x8 block (edge-replicated at
    plane borders); returns the new DC predictor."""
    ph, pw = plane.shape
    ys = np.minimum(np.arange(y0, y0 + 8), ph - 1)
    xs = np.minimum(np.arange(x0, x0 + 8), pw - 1)
    block = plane[np.ix_(ys, xs)].astype(np.float64) - 128.0
    qc = _quantize(_M @ block @ _M.T, q2d)
    diff = int(qc[0, 0]) - pred
    s, amp = _magnitude(diff)
    code, length = _DC_ENC[s]
    wtr.write(code, length)
    if s:
        wtr.write(amp, s)
    zz = [int(qc.flat[ZIGZAG[k]]) for k in range(1, 64)]
    run = 0
    last_nz = max((i for i, v in enumerate(zz) if v), default=-1)
    for i, v in enumerate(zz):
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_ENC[0xF0]  # ZRL
            wtr.write(code, length)
            run -= 16
        s, amp = _magnitude(v)
        code, length = _AC_ENC[(run << 4) | s]
        wtr.write(code, length)
        wtr.write(amp, s)
        run = 0
    if last_nz < 62:
        code, length = _AC_ENC[0x00]  # EOB
        wtr.write(code, length)
    return int(qc[0, 0])


def _downsample2(comp: np.ndarray) -> np.ndarray:
    """2x2 box downsample with integer round-half-up (edge-replicate
    odd dims first) — the 4:2:0 chroma path. Constant 2x2 regions
    survive exactly, which is what keeps the macro-tile corpus in
    closed form."""
    h, w = comp.shape
    if h % 2:
        comp = np.vstack([comp, comp[-1:, :]])
    if w % 2:
        comp = np.hstack([comp, comp[:, -1:]])
    c = comp.astype(np.int64)
    s = c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
    return ((s + 2) // 4).astype(np.uint8)


def encode_baseline_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 planes-as-components
    (no color transform — components are stored verbatim; compose
    with :func:`rgb_to_ycbcr` for JFIF color) -> baseline JFIF bytes.
    ``subsample=True`` (3-component only) writes 4:2:0 — Y at 2x2
    sampling, chroma box-downsampled — the layout virtually every
    real-world photo uses. Edge blocks pad by edge replication."""
    if img.ndim == 2:
        comps = [img]
    else:
        comps = [np.ascontiguousarray(img[:, :, c]) for c in range(img.shape[2])]
    nc = len(comps)
    if subsample and nc != 3:
        raise ValueError("4:2:0 subsampling needs exactly 3 components")
    h, w = comps[0].shape
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = [
        comp if (hi, vi) == (hmax, vmax) else _downsample2(comp)
        for comp, (hi, vi) in zip(comps, samp)
    ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = bytes(int(QTABLE[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT id 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid in range(nc):
        hi, vi = samp[cid]
        out += bytes([cid + 1, (hi << 4) | vi, 0])
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for cid in range(nc):
        out += bytes([cid + 1, 0x00])
    out += b"\x00\x3f\x00"  # spectral 0..63, no successive approx

    q2d = QTABLE.reshape(8, 8).astype(np.float64)
    wtr = _BitWriter()
    pred = [0] * nc
    mcw = (w + 8 * hmax - 1) // (8 * hmax)
    mch = (h + 8 * vmax - 1) // (8 * vmax)
    for my in range(mch):
        for mx in range(mcw):
            for ci in range(nc):
                hi, vi = samp[ci]
                for v in range(vi):
                    for u in range(hi):
                        pred[ci] = _encode_block(
                            planes[ci],
                            (my * vi + v) * 8,
                            (mx * hi + u) * 8,
                            pred[ci],
                            wtr,
                            q2d,
                        )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _parse_jpeg(blob: bytes):
    """-> (h, w, n_comp, qtables{id: np64[64] row-major},
    per-comp quantized coefficient blocks [bh][bw] int64[8,8])."""
    data = bytes(blob)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    restart = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip them or the length parse misaligns
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    t[ZIGZAG[k]] = seg[i + 1 + k]
                qtables[tq] = t
                i += 65
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if not (1 <= samp >> 4 <= 2 and 1 <= samp & 0xF <= 2):
                    raise ValueError(
                        "sampling factors beyond 2x2 unsupported"
                    )
                comps.append((cid, samp, tq))
        elif marker == 0xC2:
            raise ValueError(
                "progressive JPEG (SOF2) — use "
                "image_jpeg_progressive.decode_progressive_jpeg"
            )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) unsupported"
            )
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cid, tabs >> 4, tabs & 0xF))
            pos += seglen
            break
        pos += seglen

    if not comps or h == 0:
        raise ValueError("missing SOF0 before SOS")
    hmax = max(s >> 4 for _, s, _ in comps)
    vmax = max(s & 0xF for _, s, _ in comps)
    mcw = (w + 8 * hmax - 1) // (8 * hmax)
    mch = (h + 8 * vmax - 1) // (8 * vmax)
    rdr = _BitReader(data, pos)
    pred = {cid: 0 for cid, _, _ in comps}
    # per-comp block grid in COMPONENT-PLANE coordinates (the MCU
    # scan covers mch*vi rows x mcw*hi cols of 8x8 blocks per comp)
    blocks: dict[int, list[list[np.ndarray]]] = {
        cid: [
            [None] * (mcw * (s >> 4)) for _ in range(mch * (s & 0xF))
        ]
        for cid, s, _ in comps
    }
    sel_by_cid = {cid: (d, a) for cid, d, a in sel}
    if len(comps) > 1 and len(sel) < len(comps):
        # a first SOS covering only SOME frame components means a
        # sequential per-component-scan file: the later SOS segments
        # are unparsed here, so decoding would hand downstream a grid
        # still full of None (opaque AttributeError/KeyError). Fail
        # fast, before paying for the partial entropy decode.
        raise ValueError(
            "multi-scan sequential JPEG unsupported: "
            f"{len(comps)} components, first scan covers only "
            f"{sorted(c for c, _, _ in sel)}"
        )

    def _one_block(d_id: int, a_id: int, cid: int) -> np.ndarray:
        qc = np.zeros(64, dtype=np.int64)
        s = rdr.huff(dc_tabs[d_id])
        diff = _extend(rdr.bits(s), s) if s else 0
        pred[cid] += diff
        qc[0] = pred[cid]
        k = 1
        while k < 64:
            rs = rdr.huff(ac_tabs[a_id])
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            s = rs & 0xF
            if k > 63:
                raise ValueError("AC index overrun")
            qc[k] = _extend(rdr.bits(s), s)
            k += 1
        dz = np.zeros((8, 8), dtype=np.int64)
        for kk in range(64):
            dz.flat[ZIGZAG[kk]] = qc[kk]
        return dz

    mcu = 0
    if len(sel) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved —
        # one data unit per MCU over the COMPONENT's own block grid,
        # regardless of the SOF sampling factors (a grayscale file
        # declaring 2x2 factors decodes block-raster, not 4-per-MCU)
        (scid, d_id, a_id) = sel[0]
        samp = next(s for cid, s, _ in comps if cid == scid)
        hi, vi = samp >> 4, samp & 0xF
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        bhc, bwc = (ch + 7) // 8, (cw + 7) // 8
        blocks[scid] = [[None] * bwc for _ in range(bhc)]
        for by in range(bhc):
            for bx in range(bwc):
                if restart and mcu and mcu % restart == 0:
                    rdr.align_restart()
                    pred = {cid: 0 for cid, _, _ in comps}
                blocks[scid][by][bx] = _one_block(d_id, a_id, scid)
                mcu += 1
        return h, w, comps, qtables, blocks
    for my in range(mch):
        for mx in range(mcw):
            if restart and mcu and mcu % restart == 0:
                rdr.align_restart()
                pred = {cid: 0 for cid, _, _ in comps}
            for cid, samp, _tq in comps:
                hi, vi = samp >> 4, samp & 0xF
                d_id, a_id = sel_by_cid[cid]
                for v in range(vi):
                    for u in range(hi):
                        blocks[cid][my * vi + v][mx * hi + u] = _one_block(
                            d_id, a_id, cid
                        )
            mcu += 1
    return h, w, comps, qtables, blocks


def decode_baseline_jpeg(blob: bytes) -> np.ndarray:
    """JFIF bytes -> (h, w) uint8 (1 component) or (h, w, n) uint8.
    Components are returned verbatim (the encoder stores planes with
    no color transform; compose with :func:`ycbcr_to_rgb` for JFIF
    color). Subsampled components (4:2:0) are reconstructed at their
    native resolution and upsampled by replication to full size."""
    h, w, comps, qtables, blocks = _parse_jpeg(blob)
    hmax = max(s >> 4 for _, s, _ in comps)
    vmax = max(s & 0xF for _, s, _ in comps)
    planes = []
    for cid, samp, tq in comps:
        hi, vi = samp >> 4, samp & 0xF
        grid = blocks[cid]
        n_brows, n_bcols = len(grid), len(grid[0])
        q2d = qtables[tq].reshape(8, 8).astype(np.float64)
        full = np.zeros((n_brows * 8, n_bcols * 8), dtype=np.float64)
        for by in range(n_brows):
            for bx in range(n_bcols):
                deq = grid[by][bx].astype(np.float64) * q2d
                px = _M.T @ deq @ _M + 128.0
                full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
        plane = np.clip(np.floor(full + 0.5), 0, 255).astype(np.uint8)
        # crop to the component's native dims, then replicate-upsample
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        plane = plane[:ch, :cw]
        if (hi, vi) != (hmax, vmax):
            ys = (np.arange(h) * vi) // vmax
            xs = (np.arange(w) * hi) // hmax
            plane = plane[np.ix_(ys, xs)]
        else:
            plane = plane[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


# JFIF color transform (ITU-R BT.601 full-range), round-half-up on
# both sides — compose with encode/decode when components are RGB
def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(img: np.ndarray) -> np.ndarray:
    y = img[:, :, 0].astype(np.float64)
    cb = img[:, :, 1].astype(np.float64) - 128.0
    cr = img[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def decode_quantized_blocks(blob: bytes):
    """Entropy-layer hook for tests: component id -> [[int64 8x8]] of
    QUANTIZED coefficients (entropy coding is lossless over these)."""
    _, _, comps, _, blocks = _parse_jpeg(blob)
    return {cid: blocks[cid] for cid, _, _ in comps}


# ------------------------------------------------------------------ #
# Spark surface                                                      #
# ------------------------------------------------------------------ #


def _tile_image(m: int, w: int, h: int) -> np.ndarray:
    """Uniform 8x8 tiles; tile (bx, by) has value
    (m*7 + bx*13 + by*29) % 256 — the closed-form corpus whose decode
    is exactly restatable (see module docstring)."""
    img = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                m * 7 + bx * 13 + by * 29
            ) % 256
    return img


def _dims(m: int) -> tuple[int, int]:
    return 16 + (m % 5) * 8, 16 + (m % 3) * 8


def synth_jpeg_corpus(ids: DataFrame) -> DataFrame:
    """(media_id) -> (media_id, content: real baseline-JPEG bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for m in pdf["media_id"]:
                m = int(m)
                w, h = _dims(m)
                out["media_id"].append(m)
                out["content"].append(
                    encode_baseline_jpeg(_tile_image(m, w, h))
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(gen, JPEG_BLOB_SCHEMA)


def decode_jpeg(blobs: DataFrame) -> DataFrame:
    """(media_id, content) -> dims + exact pixel sum per file."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in JPEG_META_SCHEMA.fields}
            for m, blob in zip(pdf["media_id"], pdf["content"]):
                px = decode_baseline_jpeg(bytes(blob))
                nc = 1 if px.ndim == 2 else px.shape[2]
                out["media_id"].append(int(m))
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["n_components"].append(nc)
                out["sum_px"].append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(gen, JPEG_META_SCHEMA)


JPEG3_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_c1", LongType()),
        StructField("sum_c2", LongType()),
        StructField("sum_c3", LongType()),
    ]
)


def _macro_tile_image(m: int, w: int, h: int) -> np.ndarray:
    """3-component image of uniform 16x16 macro-tiles: channel c of
    tile (bx, by) = (m*7 + bx*13 + by*29 + c*41) % 256. Constant
    macroblocks make 4:2:0 EXACT: the 2x2 chroma box average of a
    constant is that constant, every 8x8 block (Y and chroma) is
    DC-only, and replication-upsampling restores the same value."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for by in range(h // 16):
        for bx in range(w // 16):
            for c in range(3):
                img[
                    by * 16 : by * 16 + 16, bx * 16 : bx * 16 + 16, c
                ] = (m * 7 + bx * 13 + by * 29 + c * 41) % 256
    return img


def _dims420(m: int) -> tuple[int, int]:
    return 32 + (m % 3) * 16, 16 + (m % 2) * 16


def synth_jpeg420_corpus(ids: DataFrame) -> DataFrame:
    """(media_id) -> (media_id, content: real 4:2:0 baseline JPEG)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for m in pdf["media_id"]:
                m = int(m)
                w, h = _dims420(m)
                out["media_id"].append(m)
                out["content"].append(
                    encode_baseline_jpeg(
                        _macro_tile_image(m, w, h), subsample=True
                    )
                )
            yield pd.DataFrame(out)

    return ids.mapInPandas(gen, JPEG_BLOB_SCHEMA)


def decode_jpeg_channels(blobs: DataFrame) -> DataFrame:
    """(media_id, content) -> dims + exact PER-CHANNEL pixel sums
    for 3-component JPEGs (the 4:2:0 audit surface)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in JPEG3_META_SCHEMA.fields}
            for m, blob in zip(pdf["media_id"], pdf["content"]):
                px = decode_baseline_jpeg(bytes(blob)).astype(np.int64)
                out["media_id"].append(int(m))
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                for c in range(3):
                    out[f"sum_c{c + 1}"].append(int(px[:, :, c].sum()))
            yield pd.DataFrame(out)

    return blobs.mapInPandas(gen, JPEG3_META_SCHEMA)
