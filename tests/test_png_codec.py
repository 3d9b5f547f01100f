"""PNG codec (multimodal/image_png.py): numpy round trip across all
five filter types, CRC validation, profile rejection, and the Spark
kernel path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sfdata_wrangler_spark.multimodal.image_png import (
    decode_png,
    decode_png24,
    encode_png24,
    synth_png_corpus,
    _pixels,
)


def test_roundtrip_exercises_all_filters():
    # 7 rows → filters 0,1,2,3,4,0,1 all hit
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(7, 11, 3), dtype=np.uint8)
    assert np.array_equal(decode_png24(encode_png24(img)), img)


def test_roundtrip_edge_shapes():
    for h, w in [(1, 1), (1, 8), (5, 1), (2, 2)]:
        img = _pixels(9, w, h)
        assert np.array_equal(decode_png24(encode_png24(img)), img)


def test_crc_corruption_detected():
    blob = bytearray(encode_png24(_pixels(1, 8, 6)))
    # flip a byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = blob.index(b"IDAT")
    blob[idat_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png24(bytes(blob))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png24(b"NOTAPNG" + b"\x00" * 50)


def test_unsupported_profile_rejected():
    # hand-build an IHDR claiming 16-bit depth
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_png24(sig + chunk)


def test_spark_kernel_matches_formula(spark):
    ids = spark.createDataFrame([(m,) for m in (0, 5, 13)], "media_id long")
    rows = {r["media_id"]: r for r in decode_png(synth_png_corpus(ids)).collect()}
    for m in (0, 5, 13):
        w, h = 24 + (m % 9) * 4, 18 + (m % 7) * 4
        img = _pixels(m, w, h).astype(np.int64)
        r = rows[m]
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_r"] == img[:, :, 0].sum()
        assert r["sum_g"] == img[:, :, 1].sum()
        assert r["sum_b"] == img[:, :, 2].sum()


def test_phash_invariant_to_jitter_and_distinct_across_images(spark):
    """aHash over real decoded pixels: a +1-brightness clone stays
    within a few bits of its original; unrelated images do not."""
    from sfdata_wrangler_spark.multimodal.image_bmp import (
        phash_bmp,
        synth_bmp_corpus_jittered,
    )

    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    ph = {
        r.media_id: r.phash
        for r in phash_bmp(
            synth_bmp_corpus_jittered(ids, clone_from=10)
        ).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for m in range(10):
        assert ham(ph[m], ph[m + 10]) <= 8, (m, ham(ph[m], ph[m + 10]))
    # distinct source images: far apart on average
    import itertools

    dists = [
        ham(ph[a], ph[b]) for a, b in itertools.combinations(range(10), 2)
    ]
    assert sum(d > 8 for d in dists) > len(dists) * 0.7
