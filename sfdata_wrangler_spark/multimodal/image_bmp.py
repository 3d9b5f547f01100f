"""REAL image decode/resize for binary media columns.

Like :mod:`.audio_wav` (stdlib ``wave`` / RIFF), this module runs a
genuine codec with no third-party imaging library: 24-bit uncompressed
BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) is fully specified and
stdlib-writable/parseable. The kernels do an honest encode → decode
round trip through the real file format — byte-for-byte header layout,
bottom-up row order, 4-byte row padding — Arrow-batched via
``mapInPandas``, the same plumbing shape as the rest of the multimodal
surface (ref sfdata_wrangler has no media path; this is
beyond-reference surface for training-data pipelines).

Outputs are integers (dimensions, exact per-channel pixel sums) so a
SQL oracle can restate them in closed form when the pixel payload is
deterministic. Resize is nearest-neighbor with pure integer source
indexing (``src = (dst * src_len) // dst_len``) — exactly restatable
in SQL.
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

BMP_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("bpp", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

BMP_RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

BMP_BLOB_SCHEMA = StructType(
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


# ---------------------------------------------------------------------------
# codec: 24-bit uncompressed BMP, written and parsed byte-by-byte
# ---------------------------------------------------------------------------


def encode_bmp24(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB, top-down → real BMP bytes.

    Writes the standard layout: 14-byte BITMAPFILEHEADER, 40-byte
    BITMAPINFOHEADER, then the pixel array as BGR rows bottom-up, each
    row padded to a 4-byte boundary.
    """
    h, w, _ = img.shape
    row_size = (3 * w + 3) & ~3
    pix_size = row_size * h
    # BGR byte order, bottom-up rows, per-row padding
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pix_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pix_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp24(blob: bytes) -> np.ndarray:
    """Real BMP parse → (H, W, 3) uint8 RGB top-down.

    Validates the ``BM`` magic, reads the pixel-array offset and
    BITMAPINFOHEADER dims/bpp, strips row padding, and flips the
    bottom-up row order (negative height = already top-down).
    """
    if blob[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    (data_off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", blob, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    bpp, compression = struct.unpack_from("<HI", blob, 28)[0], struct.unpack_from(
        "<I", blob, 30
    )[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    h = abs(h_signed)
    row_size = (3 * w + 3) & ~3
    arr = np.frombuffer(blob, dtype=np.uint8, count=row_size * h, offset=data_off)
    rows = arr.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up (the common case) → flip to top-down
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR → RGB


def nn_resize(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resize with integer source indexing:
    ``src = (dst * src_len) // dst_len`` — deterministic and exactly
    restatable in SQL (no float rounding anywhere)."""
    h, w, _ = img.shape
    ix = (np.arange(new_w) * w) // new_w
    iy = (np.arange(new_h) * h) // new_h
    return img[np.ix_(iy, ix)]


# ---------------------------------------------------------------------------
# deterministic corpus + Spark kernels
# ---------------------------------------------------------------------------


def synth_pixels(m: int) -> np.ndarray:
    """Closed-form test image for media id ``m``: dims
    ``w = 24 + (m % 9) * 4``, ``h = 18 + (m % 7) * 4``; pixel (x, y)
    channels ``r = (m*3 + x*7 + y*11) % 256``,
    ``g = (m*5 + x*13 + y*17) % 256``, ``b = (m*7 + x*19 + y*23) % 256``
    — every decoded statistic is restatable in SQL."""
    w = 24 + (m % 9) * 4
    h = 18 + (m % 7) * 4
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (m * 3 + x * 7 + y * 11) % 256
    g = (m * 5 + x * 13 + y * 17) % 256
    b = (m * 7 + x * 19 + y * 23) % 256
    return np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def synth_bmp_corpus(ids: DataFrame) -> DataFrame:
    """(media_id) → (media_id, content): deterministic pixels per id
    encoded through the REAL BMP writer."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for mid in pdf["media_id"]:
                m = int(mid)
                out["media_id"].append(m)
                out["content"].append(encode_bmp24(synth_pixels(m)))
            yield pd.DataFrame(out)

    return ids.select("media_id").mapInPandas(kernel, BMP_BLOB_SCHEMA)


def decode_bmp(media: DataFrame) -> DataFrame:
    """(media_id, content: binary BMP) → dims + exact per-channel
    sums. Real parse on every row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in BMP_META_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp24(bytes(blob))
                h, w, _ = img.shape
                sums = img.astype(np.int64).sum(axis=(0, 1))
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["bpp"].append(24)
                out["n_bytes"].append(len(blob))
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, BMP_META_SCHEMA
    )


def resize_bmp(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Real decode → aspect-preserving nearest-neighbor shrink to
    ``max_side`` (integer arithmetic: ``nw = max(1, w*max_side //
    max(w,h))``) → exact per-channel sums of the resized image."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in BMP_RESIZED_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp24(bytes(blob))
                h, w, _ = img.shape
                side = max(w, h)
                if side > max_side:
                    nw = max(1, (w * max_side) // side)
                    nh = max(1, (h * max_side) // side)
                else:
                    nw, nh = w, h
                small = nn_resize(img, nw, nh)
                sums = small.astype(np.int64).sum(axis=(0, 1))
                out["media_id"].append(int(mid))
                out["width"].append(nw)
                out["height"].append(nh)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, BMP_RESIZED_SCHEMA
    )


BMP_PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("py", LongType()),
        StructField("px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def patchify_bmp(media: DataFrame, patch: int = 8) -> DataFrame:
    """ViT-style patch extraction: real decode → non-overlapping
    ``patch``×``patch`` grid (ragged right/bottom edges dropped, the
    standard crop-to-multiple) → one row per patch with exact
    per-channel pixel sums. The batch fan-out is rows-per-image =
    (w//patch)*(h//patch), emitted from the same Arrow batch — the
    plumbing shape a ViT training pipeline needs before normalizing
    patches into token embeddings."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in BMP_PATCH_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp24(bytes(blob))
                h, w, _ = img.shape
                ny, nx = h // patch, w // patch
                if ny == 0 or nx == 0:
                    continue
                cropped = img[: ny * patch, : nx * patch].astype(np.int64)
                # (ny, patch, nx, patch, 3) -> per-patch channel sums
                sums = cropped.reshape(ny, patch, nx, patch, 3).sum(
                    axis=(1, 3)
                )
                for py in range(ny):
                    for px in range(nx):
                        out["media_id"].append(int(mid))
                        out["py"].append(py)
                        out["px"].append(px)
                        out["sum_r"].append(int(sums[py, px, 0]))
                        out["sum_g"].append(int(sums[py, px, 1]))
                        out["sum_b"].append(int(sums[py, px, 2]))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, BMP_PATCH_SCHEMA
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def phash_bmp(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: decode the
    BMP, nearest-neighbor sample to a ``grid``×``grid`` mosaic
    (integer source indexing — restatable in SQL), take each cell's
    channel sum, and set bit ``y·grid + x`` iff the cell is brighter
    than the image mean (the integer-exact rule
    ``grid²·cell > Σcells`` — no float division anywhere). The
    64-bit hash is emitted as a SIGNED BIGINT (bit 63 → sign), the
    same convention as the SimHash fingerprints, so
    ``operators.dedup.simhash_hamming_pairs`` does image near-dup
    matching unchanged: aHash is designed so small edits (re-encode,
    brightness jitter, mild rescale) flip few bits.
    """
    n_cells = grid * grid

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "phash": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                img = decode_bmp24(bytes(blob)).astype(np.int64)
                cells = nn_resize(img, grid, grid).sum(axis=2)
                total = int(cells.sum())
                flat = cells.flatten()  # row-major: i = y*grid + x
                v = 0
                for i in range(n_cells):
                    if n_cells * int(flat[i]) > total:
                        v |= 1 << i
                if v >= 1 << 63:
                    v -= 1 << 64
                out["media_id"].append(int(mid))
                out["phash"].append(v)
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, PHASH_SCHEMA
    )


def synth_bmp_corpus_jittered(ids: DataFrame, clone_from: int = 60) -> DataFrame:
    """(media_id) → (media_id, content) where ids ≥ ``clone_from``
    encode the pixels of (id − clone_from) with every channel +1
    (mod 256) — a brightness-jittered NEAR-DUPLICATE of the original,
    so perceptual-hash matching has planted positives with a known
    closed form."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for mid in pdf["media_id"]:
                m = int(mid)
                if m >= clone_from:
                    img = (
                        (synth_pixels(m - clone_from).astype(np.int64) + 1)
                        % 256
                    ).astype(np.uint8)
                else:
                    img = synth_pixels(m)
                out["media_id"].append(m)
                out["content"].append(encode_bmp24(img))
            yield pd.DataFrame(out)

    return ids.select("media_id").mapInPandas(kernel, BMP_BLOB_SCHEMA)
