"""MJPEG-in-AVI codec (multimodal/video_mjpeg.py): container headers
declare MJPG, per-frame JPEGs roundtrip through the real image_jpeg
decoder, sampling touches only requested frames, and non-MJPEG input
routes to a clear error."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row

from sfdata_wrangler_spark.multimodal.image_jpeg import decode_baseline_jpeg
from sfdata_wrangler_spark.multimodal.video_avi import encode_avi, parse_avi
from sfdata_wrangler_spark.multimodal.video_mjpeg import (
    _mj_dims,
    _mj_frame,
    _mj_frames,
    encode_mjpeg_avi,
    is_mjpeg,
)


def _closed_form_sum(m: int, w: int, h: int, t: int) -> int:
    total = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (m * 7 + bx * 13 + by * 29 + t * 31) % 256
            total += 64 * min(255, max(0, 2 * math.floor((v - 127) / 2) + 128))
    return total


def test_container_and_frames_roundtrip():
    for m in (0, 1, 5, 7):
        w, h = _mj_dims(m)
        frames = [_mj_frame(m, w, h, t) for t in range(_mj_frames(m))]
        blob = encode_mjpeg_avi(frames, fps=10)
        assert is_mjpeg(blob)
        pw, ph, fps, n, chunks = parse_avi(blob)
        assert (pw, ph, fps, n) == (w, h, 10, len(frames))
        for t, (p, s) in enumerate(chunks):
            px = decode_baseline_jpeg(blob[p : p + s]).astype(np.int64)
            assert px.shape == (h, w)
            assert int(px.sum()) == _closed_form_sum(m, w, h, t)


def test_dib_avi_is_rejected_with_clear_error(spark):
    from sfdata_wrangler_spark.multimodal.video_mjpeg import sample_mjpeg_frames

    rng = np.random.default_rng(1)
    dib = encode_avi([rng.integers(0, 256, (12, 16, 3)).astype(np.uint8)])
    assert not is_mjpeg(dib)
    media = spark.createDataFrame([Row(media_id=1, content=bytearray(dib))])
    with pytest.raises(Exception, match="not an MJPEG"):
        sample_mjpeg_frames(media).collect()


def test_spark_sampling_decodes_every_second_frame(spark):
    from sfdata_wrangler_spark.multimodal.video_mjpeg import (
        sample_mjpeg_frames,
        synth_mjpeg_corpus,
    )

    ids = spark.createDataFrame([Row(media_id=m) for m in range(9)])
    rows = sample_mjpeg_frames(synth_mjpeg_corpus(ids), every=2).collect()
    for r in rows:
        w, h = _mj_dims(r["media_id"])
        assert r["frame_idx"] % 2 == 0
        assert (r["width"], r["height"]) == (w, h)
        assert r["sum_px"] == _closed_form_sum(
            r["media_id"], w, h, r["frame_idx"]
        )
    # per clip: ceil(n/2) sampled frames
    from collections import Counter

    per = Counter(r["media_id"] for r in rows)
    for m in range(9):
        assert per[m] == (_mj_frames(m) + 1) // 2


def test_mjpeg_avi_rejected_by_dib_sampler_with_clear_error(spark):
    """The reciprocal of the MJPEG-side guard (code-review r7): the
    DIB sampler must route a compressed stream to a clear error, not
    feed JPEG bytes to _undib."""
    from sfdata_wrangler_spark.multimodal.video_avi import sample_avi_frames

    w, h = _mj_dims(1)
    blob = encode_mjpeg_avi([_mj_frame(1, w, h, 0)])
    media = spark.createDataFrame([Row(media_id=1, content=bytearray(blob))])
    with pytest.raises(Exception, match="MJPG"):
        sample_avi_frames(media).collect()


def test_is_mjpeg_keys_on_the_video_stream():
    """A leading audio strl (WAVEFORMATEX strf) must not be misread
    as the video format (code-review r7): splice an 'auds' strl ahead
    of the video one and re-check."""
    import struct

    from sfdata_wrangler_spark.multimodal.video_avi import _chunk, _list

    w, h = _mj_dims(2)
    blob = encode_mjpeg_avi([_mj_frame(2, w, h, 0)])
    # minimal audio strl: strh fccType 'auds' + 16-byte WAVEFORMAT-ish
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x01\x00\x00\x00",
                       0, 0, 0, 0, 1, 8000, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    audio_strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    i = blob.find(b"LIST")  # hdrl LIST
    # insert the audio strl right after avih inside hdrl: rebuild by
    # splicing before the video strl
    j = blob.find(b"strl")
    j = blob.rfind(b"LIST", 0, j)  # the video strl's LIST header
    patched = bytearray(blob[:j] + audio_strl + blob[j:])
    # fix the hdrl LIST size and RIFF size
    hd = patched.find(b"LIST")
    old = struct.unpack_from("<I", patched, hd + 4)[0]
    struct.pack_into("<I", patched, hd + 4, old + len(audio_strl))
    struct.pack_into("<I", patched, 4, len(patched) - 8)
    assert is_mjpeg(bytes(patched))
