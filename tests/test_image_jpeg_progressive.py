"""Progressive JPEG (multimodal/image_jpeg_progressive.py): the
reassembled multi-scan coefficient grid must equal the BASELINE
quantization path bit-for-bit (independent routes — mirrored
bit-plane bugs can't cancel), pixels must match baseline decode, and
cross-module rejection messages route correctly."""

from __future__ import annotations

import numpy as np
import pytest

from sfdata_wrangler_spark.multimodal.image_jpeg import (
    _dims,
    _tile_image,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)
from sfdata_wrangler_spark.multimodal.image_jpeg_progressive import (
    _quantized_blocks,
    _zz,
    decode_progressive_coefficients,
    decode_progressive_jpeg,
    encode_progressive_jpeg,
)


def _assert_coef_parity(img: np.ndarray) -> None:
    coef = decode_progressive_coefficients(encode_progressive_jpeg(img))
    base = _quantized_blocks(img)
    for ci, grid in enumerate(base, start=1):
        for by, row in enumerate(grid):
            for bx, blk in enumerate(row):
                want = np.array(_zz(blk), dtype=np.int64)
                assert (coef[ci][by, bx] == want).all(), (ci, by, bx)


def test_random_images_coefficient_parity_vs_baseline_path():
    rng = np.random.default_rng(42)
    for shape in ((8, 8), (24, 40), (13, 21)):
        _assert_coef_parity(
            rng.integers(0, 256, shape, dtype=np.int64).astype(np.uint8)
        )


def test_smooth_gradient_exercises_refinement_paths():
    """Small AC magnitudes make coefficients appear across DIFFERENT
    bit planes — newly-significant insertion and correction bits both
    fire (uniform noise mostly saturates the first pass)."""
    x = np.linspace(0, 255, 40)
    y = np.linspace(0, 255, 24)
    img = ((x[None, :] + y[:, None]) / 2).astype(np.uint8)
    _assert_coef_parity(img)


def test_tiles_match_baseline_pixels_exactly():
    for m in (0, 5, 17, 23):
        w, h = _dims(m)
        img = _tile_image(m, w, h)
        p = decode_progressive_jpeg(encode_progressive_jpeg(img))
        b = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert (p == b).all()


def test_color_3_component_matches_baseline():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.int64).astype(np.uint8)
    p = decode_progressive_jpeg(encode_progressive_jpeg(img))
    b = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert p.shape == (16, 24, 3) and (p == b).all()


def test_cross_module_routing():
    img = _tile_image(1, 16, 16)
    prog = encode_progressive_jpeg(img)
    base = encode_baseline_jpeg(img)
    with pytest.raises(ValueError, match="progressive"):
        decode_baseline_jpeg(prog)
    with pytest.raises(ValueError, match="SOF0"):
        decode_progressive_jpeg(base)
