"""REAL GIF codec for binary media columns (stdlib only).

Third member of the real-codec family (BMP = uncompressed, PNG =
deflate): GIF87a with a genuine byte-level container — header,
logical screen descriptor, global color table, image descriptor,
LZW-coded index sub-blocks, trailer — and a REAL variable-width LZW
decoder (LSB-first bitstream, dictionary growth, clear/EOI codes).

The encoder writes the standard "uncompressed GIF" LZW stream:
every pixel as a literal code with a clear code every
``2^min_code_size - 2`` symbols so the code width never grows past
min+1 — a fully spec-conformant stream any GIF reader accepts, which
the decoder here handles through the same general LZW path it would
use for a compressed stream (the dictionary still grows and must be
tracked to keep the bit cursor aligned).

GIF is paletted, so the corpus pattern is an INDEX image: pixel
index = the closed-form byte, palette[i] = (i, (2i) % 256,
(3i) % 256) — channel sums stay in closed form for the oracle.
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

GIF_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("palette_size", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

GIF_BLOB_SCHEMA = StructType(
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


_PALETTE = np.stack(
    [
        np.arange(256, dtype=np.int64),
        (2 * np.arange(256, dtype=np.int64)) % 256,
        (3 * np.arange(256, dtype=np.int64)) % 256,
    ],
    axis=1,
).astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def encode_gif(indices: np.ndarray) -> bytes:
    """(H, W) uint8 index image → GIF87a bytes with the fixed
    256-entry global palette. LZW stream is literal-coded with
    periodic clear codes (spec-valid, uncompressed)."""
    h, w = indices.shape
    out = bytearray(b"GIF87a")
    # logical screen descriptor: GCT present, 8 bits/pixel, 256 colors
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += _PALETTE.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    min_code = 8
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bw = _BitWriter()
    width = min_code + 1
    bw.write(clear, width)
    budget = (1 << min_code) - 2  # literals until the dict would widen codes
    n = 0
    for v in indices.ravel():
        if n == budget:
            bw.write(clear, width)
            n = 0
        bw.write(int(v), width)
        n += 1
    bw.write(eoi, width)
    data = bw.finish()
    out.append(min_code)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code: int, n_expected: int) -> bytes:
    """General GIF LZW decode (handles compressed streams, not just
    the literal encoding this module writes)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    br = _BitReader(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(1 << min_code)}, min_code + 1

    table, width = reset()
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = br.read(width)
        if code == clear:
            table, width = reset()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: invalid LZW code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            break
    if len(out) != n_expected:
        raise ValueError(
            f"GIF: decoded {len(out)} pixels, expected {n_expected}"
        )
    return bytes(out)


def decode_gif(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Real GIF parse → (index image (H, W) uint8, palette (N, 3)
    uint8). Walks the container byte-for-byte; supports the profile
    this pipeline writes (GIF87a/89a, global palette, single
    non-interlaced image) and rejects the rest loudly."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    gct_n = 2 << (flags & 0x07)
    palette = np.frombuffer(
        blob, dtype=np.uint8, count=3 * gct_n, offset=pos
    ).reshape(gct_n, 3)
    pos += 3 * gct_n
    while True:
        marker = blob[pos]
        if marker == 0x21:  # extension: skip sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif marker == 0x2C:
            break
        else:
            raise ValueError(f"unsupported GIF block 0x{marker:02x}")
    ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
    pos += 10
    if iflags & 0xC0:
        raise ValueError("unsupported GIF: local palette / interlace")
    min_code = blob[pos]
    pos += 1
    data = bytearray()
    while blob[pos] != 0:
        n = blob[pos]
        data += blob[pos + 1 : pos + 1 + n]
        pos += 1 + n
    idx = np.frombuffer(
        _lzw_decode(bytes(data), min_code, iw * ih), dtype=np.uint8
    ).reshape(ih, iw)
    return idx, palette


# ---------------------------------------------------------------------------
# Spark kernels
# ---------------------------------------------------------------------------


def _index_pattern(m: int, w: int, h: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return ((m * 3 + x * 7 + y * 11) % 256).astype(np.uint8)


def synth_gif_corpus(ids: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                w, h = 24 + (m % 9) * 4, 18 + (m % 7) * 4
                rows.append((m, encode_gif(_index_pattern(m, w, h))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids.mapInPandas(gen, GIF_BLOB_SCHEMA)


def decode_gif_df(blobs: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, blob in zip(pdf["media_id"], pdf["content"]):
                idx, palette = decode_gif(bytes(blob))
                h, w = idx.shape
                rgb = palette[idx].astype(np.int64)
                rows.append(
                    (
                        int(m),
                        w,
                        h,
                        len(palette),
                        int(rgb[:, :, 0].sum()),
                        int(rgb[:, :, 1].sum()),
                        int(rgb[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "palette_size",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                ],
            )

    return blobs.mapInPandas(gen, GIF_META_SCHEMA)
