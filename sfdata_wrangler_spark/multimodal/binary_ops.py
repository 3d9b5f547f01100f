"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (BASELINE.json north star). Media travel as
opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
stages so bytes stream through in columnar batches and never
materialize on the driver.

Real codecs: BMP images (stdlib-parseable, see :mod:`.image_bmp`) and
RIFF/WAVE audio (:mod:`.audio_wav`) decode for real — ``fake=False``
(the default) parses actual file bytes. JPEG/PNG/MP4 need codec
libraries absent from this container, so non-BMP payloads raise
``ValueError`` on the real path; ``fake=True`` keeps the
deterministic synthetic decode for plumbing tests over arbitrary
bytes (schema, batching, partitioning, UDF signatures).
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-row schema: id + opaque payload + typed metadata
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

_DECODED_FIELDS = [
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
]
DECODED_SCHEMA = StructType(_DECODED_FIELDS)
FEATURE_SCHEMA = StructType(
    _DECODED_FIELDS[:1] + [StructField("features", ArrayType(FloatType()))]
)
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame_checksum", StringType()),
    ]
)


def _register_by_value() -> None:
    """Make this module's mapInPandas kernels self-contained under
    cloudpickle — executor workers may not have the repo on sys.path
    when the driver runs from another cwd."""
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_by_value()


def _fake_decode(content: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real image decode: dimensions and
    checksum derived from the payload bytes."""
    h = hashlib.md5(content or b"").hexdigest()
    w = 64 + int(h[:4], 16) % 512
    ht = 64 + int(h[4:8], 16) % 512
    return w, ht, h


def _real_decode(content: bytes) -> tuple[int, int, str]:
    """Real image decode (BMP): parse the actual bytes; checksum is
    md5 of the decoded top-down RGB pixel array — a content hash of
    the *image*, not the container."""
    from .image_bmp import decode_bmp24

    if (content or b"")[:2] != b"BM":
        raise ValueError(
            "unsupported image codec (only BMP decodes without external "
            "libraries); pass fake=True for the synthetic plumbing path"
        )
    img = decode_bmp24(bytes(content))
    h, w = img.shape[:2]
    return w, h, hashlib.md5(img.tobytes()).hexdigest()


def decode_images(df: DataFrame, fake: bool = False) -> DataFrame:
    """binary content → (media_id, width, height, n_bytes, checksum).

    Default is the REAL path: BMP bytes are parsed (header + pixel
    array) and the checksum hashes the decoded pixels. ``fake=True``
    keeps the md5-derived synthetic decode for arbitrary payloads.
    ``mapInPandas``: one Arrow batch in, one out; nothing driver-side.
    """
    decode = _fake_decode if fake else _real_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "checksum": [d[2] for d in decoded],
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, DECODED_SCHEMA)


def extract_image_features(
    df: DataFrame, dim: int = 8, fake: bool = False
) -> DataFrame:
    """binary content → fixed-dim float feature vector.

    Real path (default, BMP): average-pool the decoded image into
    ``dim`` vertical strips and emit each strip's mean intensity in
    [0, 1) — a genuine (if simple) visual descriptor computed from
    real pixels. ``fake=True``: md5-digest bytes scaled to [0, 1)
    (deterministic, shape-correct) for arbitrary payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .image_bmp import decode_bmp24

        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if fake:
                    digest = hashlib.md5(c or b"").digest()
                    feats.append([digest[i % 16] / 256.0 for i in range(dim)])
                    continue
                img = decode_bmp24(bytes(c)).astype(np.float64)
                gray = img.mean(axis=2)  # H x W intensity
                w = gray.shape[1]
                bounds = [(i * w) // dim for i in range(dim + 1)]
                feats.append(
                    [
                        float(gray[:, bounds[i] : max(bounds[i + 1], bounds[i] + 1)].mean())
                        / 256.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "content").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """video rows → one row per sampled frame (the UDTF-ish 1→N shape:
    mapInPandas yielding more rows than it receives).

    Real frame sampling lives in :func:`.video_avi.sample_avi_frames`
    (uncompressed DIB) and :func:`.video_mjpeg.sample_mjpeg_frames`
    (Motion-JPEG, full baseline-JPEG decode per sampled frame) —
    both genuine RIFF/AVI chunk walks. INTER-CODED codecs (H.264/MP4
    etc.) need ffmpeg, absent from this container, so the default
    here raises. ``fake=True`` keeps the deterministic synthetic
    sampler for plumbing tests over arbitrary payload bytes."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling needs ffmpeg for inter-coded codecs; "
            "use video_avi.sample_avi_frames (DIB) or "
            "video_mjpeg.sample_mjpeg_frames (MJPEG) for AVI, or "
            "fake=True for the synthetic plumbing path"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [],
                   "frame_checksum": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                n = max(1, int((dur or 0) // every_ms))
                base = hashlib.md5(content or b"").hexdigest()
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["frame_checksum"].append(
                        hashlib.md5(f"{base}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select("media_id", "content", "duration_ms").mapInPandas(
        kernel, FRAME_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_checksum", StringType()),
    ]
)


def resize_images(
    df: DataFrame, max_side: int = 256, fake: bool = False
) -> DataFrame:
    """Aspect-preserving shrink to ``max_side``, Arrow-batched.

    Real path (default, BMP): decode actual pixels, nearest-neighbor
    resize with integer source indexing (``image_bmp.nn_resize``),
    checksum the resized pixel array. ``fake=True``: dims are the
    same resize arithmetic over fake-decoded dims; the pixel
    transform is a checksum derivation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .image_bmp import decode_bmp24, nn_resize

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "resized_checksum": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if fake:
                    w, h, chk = _fake_decode(content)
                else:
                    img = decode_bmp24(bytes(content))
                    h, w = img.shape[:2]
                side = max(w, h)
                if side > max_side:
                    nw = max(1, (w * max_side) // side)
                    nh = max(1, (h * max_side) // side)
                else:
                    nw, nh = w, h
                if fake:
                    checksum = hashlib.md5(f"{chk}:{nw}x{nh}".encode()).hexdigest()
                else:
                    checksum = hashlib.md5(
                        nn_resize(img, nw, nh).tobytes()
                    ).hexdigest()
                out["media_id"].append(mid)
                out["width"].append(nw)
                out["height"].append(nh)
                out["resized_checksum"].append(checksum)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(kernel, RESIZED_SCHEMA)
