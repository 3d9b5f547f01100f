"""GIF codec (multimodal/image_gif.py): LZW round trip, a genuinely
COMPRESSED stream through the general decoder path, container
validation, Spark kernel."""

from __future__ import annotations

import numpy as np
import pytest

from sfdata_wrangler_spark.multimodal.image_gif import (
    _index_pattern,
    _lzw_decode,
    decode_gif,
    decode_gif_df,
    encode_gif,
    synth_gif_corpus,
)


def test_roundtrip_random_indices():
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 256, size=(13, 29), dtype=np.uint8)
    got, palette = decode_gif(encode_gif(idx))
    assert np.array_equal(got, idx)
    assert palette.shape == (256, 3)


def test_roundtrip_spans_clear_code_budget():
    # > 254 pixels forces the encoder's periodic clear path
    idx = _index_pattern(3, 40, 30)  # 1200 px
    got, _ = decode_gif(encode_gif(idx))
    assert np.array_equal(got, idx)


def test_general_lzw_decoder_handles_compression():
    """Hand-encode a stream that actually USES dictionary codes
    (code 258 = 'aa') — the decoder must take the compressed path,
    including the code==next_code self-reference case."""
    from sfdata_wrangler_spark.multimodal.image_gif import _BitWriter

    bw = _BitWriter()
    w = 9
    bw.write(256, w)  # clear
    bw.write(97, w)   # 'a'            → out: a
    bw.write(258, w)  # next_code self-reference → 'aa'
    bw.write(258, w)  # now in table   → 'aa'
    bw.write(257, w)  # EOI
    out = _lzw_decode(bw.finish(), 8, 5)
    assert out == b"aaaaa"


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + b"\x00" * 40)


def test_truncated_stream_rejected():
    blob = bytearray(encode_gif(_index_pattern(1, 24, 18)))
    # chop the LZW data blocks off mid-way
    with pytest.raises(ValueError):
        decode_gif(bytes(blob[: len(blob) // 2]))


def test_spark_kernel_matches_formula(spark):
    ids = spark.createDataFrame([(m,) for m in (0, 7, 11)], "media_id long")
    rows = {
        r["media_id"]: r for r in decode_gif_df(synth_gif_corpus(ids)).collect()
    }
    for m in (0, 7, 11):
        w, h = 24 + (m % 9) * 4, 18 + (m % 7) * 4
        i = _index_pattern(m, w, h).astype(np.int64)
        r = rows[m]
        assert (r["width"], r["height"], r["palette_size"]) == (w, h, 256)
        assert r["sum_r"] == i.sum()
        assert r["sum_g"] == ((2 * i) % 256).sum()
        assert r["sum_b"] == ((3 * i) % 256).sum()
