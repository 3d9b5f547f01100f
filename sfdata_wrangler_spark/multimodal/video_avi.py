"""REAL video decode for binary media columns: uncompressed RIFF/AVI.

Completes the real-codec multimodal set (WAV audio in
:mod:`.audio_wav`, BMP images in :mod:`.image_bmp`): AVI is a RIFF
container — the same chunk grammar the stdlib ``wave`` module reads —
holding raw DIB video frames (the BMP pixel-array layout: BGR rows,
bottom-up, 4-byte padded). Both the writer and the parser here speak
the genuine on-disk format: ``avih``/``strh``/``strf`` headers and a
``movi`` LIST of ``00db`` frame chunks, walked chunk-by-chunk.

Frame sampling decodes only the sampled ``00db`` chunks — the
real-world shape for "sample 1 fps from each clip" training-data
pipelines. Outputs are integers (dims, fps, exact per-frame channel
sums) so a SQL oracle can restate them when pixels are deterministic.
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

from .image_bmp import synth_pixels  # noqa: F401  (re-export convenience)

AVI_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("fps", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)

AVI_BLOB_SCHEMA = StructType(
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


def _dib(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB top-down → DIB pixel array (BGR, bottom-up,
    4-byte row padding) — the BMP body without file headers."""
    h, w, _ = img.shape
    row_size = (3 * w + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : 3 * w] = img[::-1, :, ::-1].reshape(h, 3 * w)
    return rows.tobytes()


def _undib(data: bytes, w: int, h: int) -> np.ndarray:
    row_size = (3 * w + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * h)
    return arr.reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """RGB frame stack → real AVI bytes (RIFF 'AVI ': hdrl with
    avih/strh/strf, movi with one '00db' DIB chunk per frame)."""
    h, w, _ = frames[0].shape
    row_size = (3 * w + 3) & ~3
    frame_bytes = row_size * h
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per sec
        0, 0x10,  # padding, flags (AVIF_HASINDEX off — we read movi directly)
        n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0,  # + Reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,  # scale, rate → fps = rate/scale
        0, n, frame_bytes, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", _dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a RIFF region."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def parse_avi(
    blob: bytes,
    chunk_types: tuple[bytes, ...] = (b"00db", b"00dc"),
) -> tuple[int, int, int, int, list[tuple[int, int]]]:
    """Real RIFF walk → (width, height, fps, n_frames, frame chunk
    offsets [(start, size), ...] in stream order). ``chunk_types``
    selects which movi chunks count as frames — DIB consumers pass
    ``(b"00db",)``, MJPEG consumers ``(b"00dc",)`` — so one codec's
    sampler can never misread the other's payload bytes."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")
    w = h = fps = n_frames = None
    frames: list[tuple[int, int]] = []
    for fourcc, p, size in _walk_chunks(blob, 12, len(blob)):
        if fourcc != b"LIST":
            continue
        list_type = blob[p : p + 4]
        if list_type == b"hdrl":
            for cc2, p2, s2 in _walk_chunks(blob, p + 4, p + size):
                if cc2 == b"avih":
                    n_frames = struct.unpack_from("<I", blob, p2 + 16)[0]
                elif cc2 == b"LIST" and blob[p2 : p2 + 4] == b"strl":
                    for cc3, p3, s3 in _walk_chunks(blob, p2 + 4, p2 + s2):
                        if cc3 == b"strh":
                            scale, rate = struct.unpack_from("<II", blob, p3 + 20)
                            fps = rate // max(scale, 1)
                        elif cc3 == b"strf":
                            _, w, h = struct.unpack_from("<Iii", blob, p3)
        elif list_type == b"movi":
            # 00db = uncompressed DIB frame, 00dc = compressed frame
            # (MJPEG etc. — decoded by .video_mjpeg)
            frames = [
                (p2, s2)
                for cc2, p2, s2 in _walk_chunks(blob, p + 4, p + size)
                if cc2 in chunk_types
            ]
    if w is None or fps is None or n_frames is None:
        raise ValueError("malformed AVI: missing hdrl headers")
    return w, abs(h), fps, n_frames, frames


def video_stream_compression(blob: bytes) -> bytes:
    """biCompression fourcc of the VIDEO stream ('vids' strh) —
    ``b"\\x00\\x00\\x00\\x00"`` for uncompressed DIB, ``b"MJPG"`` for
    Motion-JPEG. Walks every strl and keys on the stream TYPE, so a
    preceding audio stream (common in capture-pipeline muxes, whose
    strf is a WAVEFORMATEX) cannot be misread as the video format."""
    data = bytes(blob)
    for fourcc, p, size in _walk_chunks(data, 12, len(data)):
        if fourcc != b"LIST" or data[p : p + 4] != b"hdrl":
            continue
        for cc2, p2, s2 in _walk_chunks(data, p + 4, p + size):
            if cc2 != b"LIST" or data[p2 : p2 + 4] != b"strl":
                continue
            is_vids = False
            strf_comp = None
            for cc3, p3, _s3 in _walk_chunks(data, p2 + 4, p2 + s2):
                if cc3 == b"strh":
                    is_vids = data[p3 : p3 + 4] == b"vids"
                elif cc3 == b"strf":
                    strf_comp = data[p3 + 16 : p3 + 20]
            if is_vids and strf_comp is not None:
                return strf_comp
    raise ValueError("no video ('vids') stream found")


def synth_avi_corpus(ids: DataFrame, fps: int = 10) -> DataFrame:
    """(media_id) → (media_id, content): deterministic clip per id —
    ``n = 4 + m % 4`` frames of ``w = 16 + (m % 5) * 4`` ×
    ``h = 12 + (m % 3) * 4``, frame ``t`` pixel (x, y) channels
    ``(m*3 + x*7 + y*11 + t*29) % 256`` / ``(m*5 + x*13 + y*17 +
    t*31) % 256`` / ``(m*7 + x*19 + y*23 + t*37) % 256`` — encoded
    through the REAL AVI writer."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "content": []}
            for mid in pdf["media_id"]:
                m = int(mid)
                w = 16 + (m % 5) * 4
                h = 12 + (m % 3) * 4
                x = np.arange(w, dtype=np.int64)
                y = np.arange(h, dtype=np.int64)[:, None]
                frames = []
                for t in range(4 + m % 4):
                    r = (m * 3 + x * 7 + y * 11 + t * 29) % 256
                    g = (m * 5 + x * 13 + y * 17 + t * 31) % 256
                    b = (m * 7 + x * 19 + y * 23 + t * 37) % 256
                    frames.append(
                        np.stack(
                            [np.broadcast_to(c, (h, w)) for c in (r, g, b)],
                            axis=-1,
                        ).astype(np.uint8)
                    )
                out["media_id"].append(m)
                out["content"].append(encode_avi(frames, fps=fps))
            yield pd.DataFrame(out)

    return ids.select("media_id").mapInPandas(kernel, AVI_BLOB_SCHEMA)


def sample_avi_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """(media_id, content: binary AVI) → one row per sampled frame
    (every ``every``-th), with exact channel sums of the decoded
    pixels. Only the sampled ``00db`` chunks are decoded."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AVI_FRAME_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob)
                comp = video_stream_compression(blob)
                if comp != b"\x00\x00\x00\x00":
                    raise ValueError(
                        f"media_id={int(mid)}: compressed video stream "
                        f"({comp!r}) — use video_mjpeg.sample_mjpeg_frames "
                        "for MJPG"
                    )
                w, h, fps, n_frames, chunks = parse_avi(
                    blob, chunk_types=(b"00db",)
                )
                for idx in range(0, len(chunks), every):
                    p, size = chunks[idx]
                    img = _undib(blob[p : p + size], w, h)
                    sums = img.astype(np.int64).sum(axis=(0, 1))
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(idx)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(n_frames)
                    out["fps"].append(fps)
                    out["sum_r"].append(int(sums[0]))
                    out["sum_g"].append(int(sums[1]))
                    out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return media.select("media_id", "content").mapInPandas(
        kernel, AVI_FRAME_SCHEMA
    )
