"""REAL PNG codec for binary media columns (stdlib zlib only).

Companion to :mod:`.image_bmp` (uncompressed) — this is the
COMPRESSED image path: genuine PNG byte layout (8-byte signature,
IHDR/IDAT/IEND chunks with real CRC-32s, zlib-deflated scanlines)
with all five PNG filter types implemented on both sides. The
encoder deliberately cycles the row filter through
None/Sub/Up/Average/Paeth so a round trip proves every unfilter
branch, not just the trivial one. No PIL, no third-party codec —
``zlib`` and ``struct`` are stdlib.

Kernels are Arrow-batched ``mapInPandas`` like the rest of the
multimodal surface; outputs are integer dims + exact per-channel
pixel sums so the DuckDB oracle restates them in closed form
(compressed byte size is NOT emitted — deflate output is
implementation-defined; everything emitted is codec-invariant).
"""

from __future__ import annotations

import struct
import sys
import zlib
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

PNG_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bit_depth", LongType()),
        StructField("color_type", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

PNG_BLOB_SCHEMA = StructType(
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

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ft: int, raw: bytes, prior: bytes, bpp: int) -> bytes:
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - bpp] if i >= bpp else 0
        up = prior[i]
        upleft = prior[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, upleft)
        out[i] = (raw[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ft: int, flt: bytes, prior: bytes, bpp: int) -> bytes:
    out = bytearray(len(flt))
    for i in range(len(flt)):
        left = out[i - bpp] if i >= bpp else 0
        up = prior[i]
        upleft = prior[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        elif ft == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[i] = (flt[i] + pred) & 0xFF
    return bytes(out)


def encode_png24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → real PNG bytes (8-bit RGB, color type
    2). Row ``y`` uses filter ``y % 5``, exercising every filter."""
    h, w, _ = img.shape
    bpp = 3
    prior = bytes(w * bpp)
    scan = bytearray()
    for y in range(h):
        raw = img[y].tobytes()
        ft = y % 5
        scan.append(ft)
        scan += _filter_row(ft, raw, prior, bpp)
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png24(blob: bytes) -> np.ndarray:
    """Real PNG parse → (H, W, 3) uint8 RGB. Walks chunks, checks
    every CRC, inflates IDAT (multi-chunk safe), undoes per-row
    filters. Supports the profile this pipeline writes (8-bit RGB,
    no interlace) and rejects everything else loudly."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        payload = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile: depth={depth} color={ctype} "
                    f"interlace={inter}"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG: no IHDR chunk")
    scan = zlib.decompress(bytes(idat))
    bpp, row_len = 3, 3 * w
    if len(scan) != h * (row_len + 1):
        raise ValueError("PNG: scanline payload size mismatch")
    out = np.empty((h, row_len), dtype=np.uint8)
    prior = bytes(row_len)
    for y in range(h):
        off = y * (row_len + 1)
        raw = _unfilter_row(scan[off], scan[off + 1 : off + 1 + row_len], prior, bpp)
        out[y] = np.frombuffer(raw, dtype=np.uint8)
        prior = raw
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Spark kernels (mapInPandas, Arrow-batched)
# ---------------------------------------------------------------------------


def _pixels(m: int, w: int, h: int) -> np.ndarray:
    """The shared closed-form test pattern (same formula as the BMP
    corpus so oracles stay in closed form)."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (m * 3 + x * 7 + y * 11) % 256
    g = (m * 5 + x * 13 + y * 17) % 256
    b = (m * 7 + x * 19 + y * 23) % 256
    return np.stack(
        np.broadcast_arrays(r, g, b), axis=-1
    ).astype(np.uint8)


def synth_png_corpus(ids: DataFrame) -> DataFrame:
    """media_id → real PNG blob of the closed-form pixel pattern
    (dims derived from the id like the BMP corpus)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                m = int(m)
                w, h = 24 + (m % 9) * 4, 18 + (m % 7) * 4
                rows.append((m, encode_png24(_pixels(m, w, h))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids.mapInPandas(gen, PNG_BLOB_SCHEMA)


def decode_png(blobs: DataFrame) -> DataFrame:
    """Decode PNG blobs → dims + exact per-channel sums."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m, blob in zip(pdf["media_id"], pdf["content"]):
                img = decode_png24(bytes(blob))
                h, w, _ = img.shape
                s = img.astype(np.int64).sum(axis=(0, 1))
                rows.append((int(m), w, h, 8, 2, int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "bit_depth",
                    "color_type",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                ],
            )

    return blobs.mapInPandas(gen, PNG_META_SCHEMA)
