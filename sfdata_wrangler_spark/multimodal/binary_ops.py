"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface (BASELINE.json north star). Media travel as
opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas``
stages so bytes stream through in columnar batches and never
materialize on the driver.

The actual codecs (PIL/ffmpeg) are NOT in this container, so the
decode kernels are STUBBED: ``fake=True`` produces a deterministic
synthetic decode (so the Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested); ``fake=False``
raises ``NotImplementedError`` until a codec library is present.
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


def decode_images(df: DataFrame, fake: bool = True) -> DataFrame:
    """binary content → (media_id, width, height, n_bytes, checksum).

    ``mapInPandas``: one Arrow batch in, one out; nothing driver-side.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/turbojpeg (not in this container); "
            "run with fake=True for the deterministic synthetic decode"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(c) for c in pdf["content"]]
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
    df: DataFrame, dim: int = 8, fake: bool = True
) -> DataFrame:
    """binary content → fixed-dim float feature vector (stub: bytes of
    the md5 digest scaled to [0,1) — deterministic, shape-correct)."""
    if not fake:
        raise NotImplementedError("real feature extraction needs a vision model")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                digest = hashlib.md5(c or b"").digest()
                feats.append([digest[i % 16] / 256.0 for i in range(dim)])
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return df.select("media_id", "content").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """video rows → one row per sampled frame (the UDTF-ish 1→N shape:
    mapInPandas yielding more rows than it receives)."""
    if not fake:
        raise NotImplementedError("real frame sampling needs ffmpeg")

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
    df: DataFrame, max_side: int = 256, fake: bool = True
) -> DataFrame:
    """Aspect-preserving resize to max_side (stub: output dims are the
    real resize arithmetic over the fake-decoded dims; the pixel
    transform is a checksum derivation). Arrow-batched mapInPandas."""
    if not fake:
        raise NotImplementedError("real resize needs PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "resized_checksum": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, chk = _fake_decode(content)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                out["media_id"].append(mid)
                out["width"].append(nw)
                out["height"].append(nh)
                out["resized_checksum"].append(
                    hashlib.md5(f"{chk}:{nw}x{nh}".encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(kernel, RESIZED_SCHEMA)
