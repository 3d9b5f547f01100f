"""Baseline-JPEG codec (multimodal/image_jpeg.py): entropy layer is
lossless over quantized coefficients on random images (Huffman, DC
DPCM, run/size with ZRL/EOB, 0xFF stuffing), the tile corpus decodes
to the documented closed form, marker parsing rejects what it cannot
honestly decode, restart intervals work, and the Spark surface sums
pixels exactly."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import Row

from sfdata_wrangler_spark.multimodal.image_jpeg import (
    _M,
    QTABLE,
    _dims,
    _quantize,
    _tile_image,
    decode_baseline_jpeg,
    decode_quantized_blocks,
    encode_baseline_jpeg,
)


def _coef_blocks(img: np.ndarray):
    q2d = QTABLE.reshape(8, 8).astype(np.float64)
    h, w = img.shape
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
            xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
            block = img[np.ix_(ys, xs)].astype(np.float64) - 128.0
            yield by, bx, _quantize(_M @ block @ _M.T, q2d)


def test_entropy_roundtrip_is_lossless_on_random_images():
    rng = np.random.default_rng(42)
    for shape in ((8, 8), (24, 40), (13, 21)):
        img = rng.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)
        blocks = decode_quantized_blocks(encode_baseline_jpeg(img))
        for by, bx, qc in _coef_blocks(img):
            assert (blocks[1][by][bx] == qc).all(), (shape, by, bx)


def test_tile_corpus_matches_closed_form():
    for m in range(40):
        w, h = _dims(m)
        dec = decode_baseline_jpeg(
            encode_baseline_jpeg(_tile_image(m, w, h))
        ).astype(np.int64)
        assert dec.shape == (h, w)
        for by in range(h // 8):
            for bx in range(w // 8):
                v = (m * 7 + bx * 13 + by * 29) % 256
                px = min(255, max(0, 2 * math.floor((v - 127) / 2) + 128))
                tile = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                assert (tile == px).all(), (m, bx, by, v)


def test_color_444_roundtrip_and_quant_error_bound():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.int64).astype(np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == (16, 24, 3)
    # entropy layer must still be lossless per component
    blocks = decode_quantized_blocks(encode_baseline_jpeg(img))
    assert sorted(blocks) == [1, 2, 3]
    for cid in (1, 2, 3):
        for by, bx, qc in _coef_blocks(img[:, :, cid - 1]):
            assert (blocks[cid][by][bx] == qc).all()


def test_progressive_and_garbage_rejected():
    img = _tile_image(1, 16, 16)
    blob = bytearray(encode_baseline_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="progressive"):
        decode_baseline_jpeg(bytes(blob))
    blob[i + 1] = 0xC3  # lossless SOF3 stays honestly unsupported
    with pytest.raises(ValueError, match="non-baseline"):
        decode_baseline_jpeg(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        decode_baseline_jpeg(b"not a jpeg")


def test_restart_interval_decoding():
    """Insert a DRI segment + RST markers between MCUs by re-encoding
    manually: encode two single-MCU images and splice. Simpler and
    spec-true: build a 2-MCU image, encode normally, then verify a
    DRI-carrying variant decodes identically by constructing it from
    per-MCU encodes."""
    img = _tile_image(3, 16, 8)  # two horizontal MCUs
    base = decode_baseline_jpeg(encode_baseline_jpeg(img))

    # encode each MCU as its own 8x8 image, then splice the entropy
    # segments with DRI=1 and an RST0 marker between them; DC DPCM
    # resets at the restart, which per-block encodes satisfy
    left = encode_baseline_jpeg(img[:, :8])
    right = encode_baseline_jpeg(img[:, 8:])

    def entropy(blob: bytes) -> bytes:
        i = blob.find(b"\xff\xda")
        ln = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        return blob[i + 2 + ln : -2]  # strip EOI

    head = left[: left.find(b"\xff\xda")]
    i = left.find(b"\xff\xda")
    ln = struct.unpack(">H", left[i + 2 : i + 4])[0]
    sos = left[i : i + 2 + ln]
    # patch SOF width 8 -> 16
    j = head.find(b"\xff\xc0")
    head = bytearray(head)
    head[j + 7 : j + 9] = struct.pack(">H", 16)
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    spliced = (
        bytes(head)
        + dri
        + sos
        + entropy(left)
        + b"\xff\xd0"
        + entropy(right)
        + b"\xff\xd9"
    )
    dec = decode_baseline_jpeg(spliced)
    assert (dec == base).all()


def test_spark_surface_sums_match_numpy(spark):
    from sfdata_wrangler_spark.multimodal.image_jpeg import (
        decode_jpeg,
        synth_jpeg_corpus,
    )

    ids = spark.createDataFrame([Row(media_id=i) for i in range(12)])
    rows = decode_jpeg(synth_jpeg_corpus(ids)).collect()
    assert len(rows) == 12
    for r in rows:
        w, h = _dims(r["media_id"])
        dec = decode_baseline_jpeg(
            encode_baseline_jpeg(_tile_image(r["media_id"], w, h))
        )
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_components"] == 1
        assert r["sum_px"] == int(dec.astype(np.int64).sum())


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
    marker; parsers that read a length where the fill byte sits
    misalign (code-review r7)."""
    img = _tile_image(2, 16, 16)
    blob = encode_baseline_jpeg(img)
    base = decode_baseline_jpeg(blob)
    # inject fill bytes before DQT, DHT and SOS markers
    padded = (
        blob.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
        .replace(b"\xff\xc4", b"\xff\xff\xff\xff\xc4", 1)
        .replace(b"\xff\xda", b"\xff\xff\xda", 1)
    )
    assert (decode_baseline_jpeg(padded) == base).all()


def test_420_macro_tiles_equal_444_exactly():
    """Constant 16x16 macroblocks survive 4:2:0 bit-for-bit: the 2x2
    chroma box average of a constant is that constant and every block
    is DC-only, so subsampled and full-resolution encodes decode to
    the identical image."""
    from sfdata_wrangler_spark.multimodal.image_jpeg import _macro_tile_image

    for m in (0, 3, 8):
        w, h = 48, 32
        img = _macro_tile_image(m, w, h)
        d420 = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
        d444 = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert (d420 == d444).all()


def test_420_roundtrip_shapes_and_y_plane_parity():
    """4:2:0 Y is NOT subsampled: its decoded plane must equal the
    4:4:4 decode of the same single-channel image; odd dims crop."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.int64).astype(np.uint8)
    d = decode_baseline_jpeg(encode_baseline_jpeg(img, subsample=True))
    assert d.shape == (13, 21, 3)
    y_only = decode_baseline_jpeg(encode_baseline_jpeg(img[:, :, 0]))
    assert (d[:, :, 0] == y_only).all()


def test_ycbcr_transform_roundtrip_bound():
    from sfdata_wrangler_spark.multimodal.image_jpeg import (
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.int64).astype(np.uint8)
    rt = ycbcr_to_rgb(rgb_to_ycbcr(img))
    assert np.abs(rt.astype(int) - img.astype(int)).max() <= 2


def test_420_rejects_wrong_component_count():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 256, (16, 16), dtype=np.int64).astype(np.uint8)
    with pytest.raises(ValueError, match="3 components"):
        encode_baseline_jpeg(gray, subsample=True)


def test_multiscan_sequential_color_rejected_with_clear_error():
    """ADVICE r7: a 3-component SOF0 whose first SOS covers only one
    component (a sequential per-component-scan file) used to return a
    partially-filled block grid and crash downstream with an opaque
    AttributeError on None. Splice a grayscale scan (same shared
    Annex-K table ids) under a color header and expect the explicit
    ValueError instead."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.int64).astype(np.uint8)
    color = encode_baseline_jpeg(img)
    gray = encode_baseline_jpeg(np.ascontiguousarray(img[:, :, 0]))
    spliced = color[: color.find(b"\xff\xda")] + gray[gray.find(b"\xff\xda") :]
    with pytest.raises(ValueError, match="multi-scan sequential"):
        decode_baseline_jpeg(spliced)

    # the interleaved shape too: a first SOS covering 2 of 3
    # components (Ns=2) used to reach the MCU loop and die with a
    # KeyError on the absent component's table selector
    i = color.find(b"\xff\xda")
    two = bytearray(color)
    # SOS: FF DA len(2) Ns(1) [cid tabs]*Ns spectral(3) — drop comp 3
    assert two[i + 4] == 3
    two[i + 3] = 10  # len 12 -> 10
    two[i + 4] = 2  # Ns 3 -> 2
    del two[i + 9 : i + 11]  # third (cid, tabs) pair
    with pytest.raises(ValueError, match="multi-scan sequential"):
        decode_baseline_jpeg(bytes(two))


def test_grayscale_with_2x2_factors_decodes_non_interleaved():
    """T.81 A.2.2: single-component scans are non-interleaved even
    when SOF declares 2x2 sampling (code-review r7) — rewrite the
    sampling byte of a grayscale file and expect an identical decode
    (the component grid, not a padded MCU grid)."""
    img = _tile_image(4, 16, 16)
    blob = bytearray(encode_baseline_jpeg(img))
    base = decode_baseline_jpeg(bytes(blob))
    i = blob.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) [cid samp tq]
    blob[i + 11] = 0x22  # 1x1 -> 2x2 sampling for the only component
    assert (decode_baseline_jpeg(bytes(blob)) == base).all()
