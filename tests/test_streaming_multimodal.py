"""Streaming sessionization ≡ batch kernel; multimodal plumbing."""

import datetime
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.multimodal import (
    decode_images,
    extract_image_features,
    sample_video_frames,
)
from sfdata_wrangler_spark.operators.windows import sessionize
from sfdata_wrangler_spark.streaming import stream_session_stats


def _events(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = []
    mins = [0, 5, 10, 50, 55, 120]  # sessions: {0,5,10}, {50,55}, {120}
    for i, m in enumerate(mins):
        rows.append(
            Row(
                event_id=i,
                user_id=1,
                ts=t0 + datetime.timedelta(minutes=m),
                value=1.0,
            )
        )
    return spark.createDataFrame(rows)


def test_session_window_matches_batch_kernel(spark):
    ev = _events(spark)
    batch = sessionize(
        ev, ["user_id"], "ts", gap_minutes=30.0, order_cols=["ts", "event_id"]
    )
    n_batch = batch.agg(F.max("SESSION_ID")).collect()[0][0]
    agg = stream_session_stats(ev, gap="30 minutes")  # batch-mode call
    assert agg.count() == n_batch == 3
    sizes = sorted(r.n_events for r in agg.collect())
    assert sizes == [1, 2, 3]


def test_streaming_sessionize_availablenow(spark, tmp_path):
    """Same aggregation through a real readStream → writeStream cycle."""
    ev = _events(spark)
    src = os.path.join(tmp_path, "src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = stream_session_stats(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM sess_test").collect()
    assert len(got) == 3
    assert sorted(r.n_events for r in got) == [1, 2, 3]


def _media(spark):
    return spark.createDataFrame(
        [
            Row(media_id=1, content=b"img-bytes-1", media_type="image",
                duration_ms=None),
            Row(media_id=2, content=b"img-bytes-2", media_type="image",
                duration_ms=None),
            Row(media_id=3, content=b"vid-bytes", media_type="video",
                duration_ms=3500),
        ],
        "media_id: bigint, content: binary, media_type: string, "
        "duration_ms: bigint",
    )


def test_decode_images_deterministic(spark):
    out1 = {
        r.media_id: r for r in decode_images(_media(spark), fake=True).collect()
    }
    out2 = {
        r.media_id: r for r in decode_images(_media(spark), fake=True).collect()
    }
    assert out1.keys() == out2.keys() == {1, 2, 3}
    assert out1[1].checksum == out2[1].checksum
    assert out1[1].checksum != out1[2].checksum
    assert out1[1].n_bytes == len(b"img-bytes-1")
    assert 64 <= out1[1].width < 576


def test_feature_extraction_shape(spark):
    out = extract_image_features(_media(spark), dim=8, fake=True).collect()
    assert all(len(r.features) == 8 for r in out)
    assert all(0.0 <= v < 1.0 for r in out for v in r.features)


def test_video_frame_sampling_one_to_many(spark):
    frames = sample_video_frames(
        _media(spark).where("media_type = 'video'"), every_ms=1000, fake=True
    ).collect()
    assert len(frames) == 3  # 3500ms at 1fps
    assert [f.frame_ms for f in sorted(frames, key=lambda r: r.frame_idx)] == [
        0, 1000, 2000,
    ]


def test_real_decode_rejects_unknown_codec(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises((ValueError, Py4JJavaError, Exception)) as exc:
        decode_images(_media(spark), fake=False).collect()
    assert "unsupported image codec" in str(exc.value)


def test_resize_images_aspect_preserving(spark):
    from sfdata_wrangler_spark.multimodal.binary_ops import (
        _fake_decode,
        resize_images,
    )

    media = _media(spark)
    out = {
        r.media_id: r
        for r in resize_images(media, max_side=128, fake=True).collect()
    }
    for mid, content in [(1, b"img-bytes-1"), (2, b"img-bytes-2")]:
        w, h, _ = _fake_decode(content)
        side = max(w, h)
        assert max(out[mid].width, out[mid].height) <= 128
        assert (out[mid].width, out[mid].height) == (
            (max(1, (w * 128) // side), max(1, (h * 128) // side))
            if side > 128
            else (w, h)
        )


def test_real_bmp_decode_resize_features(spark):
    """REAL image path end-to-end: synth pixels → real BMP encode →
    Spark decode/resize/feature kernels, checked against numpy."""
    import hashlib

    import numpy as np
    from pyspark.sql import Row

    from sfdata_wrangler_spark.multimodal.binary_ops import resize_images
    from sfdata_wrangler_spark.multimodal.image_bmp import (
        encode_bmp24,
        nn_resize,
        synth_pixels,
    )

    imgs = {m: synth_pixels(m) for m in (3, 11, 40)}
    media = spark.createDataFrame(
        [
            Row(media_id=m, content=bytearray(encode_bmp24(img)))
            for m, img in imgs.items()
        ]
    )
    dec = {r.media_id: r for r in decode_images(media).collect()}
    for m, img in imgs.items():
        h, w = img.shape[:2]
        assert (dec[m].width, dec[m].height) == (w, h)
        assert dec[m].checksum == hashlib.md5(img.tobytes()).hexdigest()

    rs = {r.media_id: r for r in resize_images(media, max_side=16).collect()}
    for m, img in imgs.items():
        h, w = img.shape[:2]
        side = max(w, h)
        nw, nh = max(1, (w * 16) // side), max(1, (h * 16) // side)
        expect = nn_resize(img, nw, nh)
        assert (rs[m].width, rs[m].height) == (nw, nh)
        assert rs[m].resized_checksum == hashlib.md5(expect.tobytes()).hexdigest()

    feats = {
        r.media_id: r.features
        for r in extract_image_features(media, dim=4).collect()
    }
    for m, img in imgs.items():
        gray = img.astype(np.float64).mean(axis=2)
        w = gray.shape[1]
        bounds = [(i * w) // 4 for i in range(5)]
        expect = [
            float(gray[:, bounds[i] : max(bounds[i + 1], bounds[i] + 1)].mean())
            / 256.0
            for i in range(4)
        ]
        assert feats[m] == [np.float32(v) for v in expect]


def test_real_wav_encode_decode_round_trip(spark):
    """The WAV kernels use the real RIFF format: bytes written by the
    stdlib wave module decode back with exact header fields and exact
    PCM energy (hand-computed for a known sample vector)."""
    from pyspark.sql import Row

    from sfdata_wrangler_spark.multimodal.audio_wav import (
        decode_wav,
        encode_pcm16_wav,
    )

    samples = [0, 1000, -1000, 32767, -32768, 5]
    blob = encode_pcm16_wav(samples, sample_rate=16000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    media = spark.createDataFrame([Row(media_id=7, content=bytearray(blob))])
    r = decode_wav(media).collect()[0]
    assert (r.sample_rate, r.n_channels, r.sample_width) == (16000, 1, 2)
    assert r.n_frames == len(samples)
    assert r.duration_ms == len(samples) * 1000 // 16000
    assert r.sum_sq == sum(s * s for s in samples)


def test_real_avi_frame_sampling(spark):
    """REAL video path: RIFF/AVI encode → chunk-walk parse → sampled
    frames decoded exactly (checked against the source numpy frames)."""
    import numpy as np
    from pyspark.sql import Row

    from sfdata_wrangler_spark.multimodal.video_avi import (
        encode_avi,
        sample_avi_frames,
    )

    rng_frames = [
        np.full((12, 16, 3), fill, dtype=np.uint8) for fill in (10, 20, 30, 40, 50)
    ]
    blob = encode_avi(rng_frames, fps=5)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    media = spark.createDataFrame([Row(media_id=9, content=bytearray(blob))])
    rows = sorted(
        sample_avi_frames(media, every=2).collect(), key=lambda r: r.frame_idx
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all((r.width, r.height, r.fps, r.n_frames) == (16, 12, 5, 5) for r in rows)
    # constant-fill frames: each channel sum = fill * w * h
    assert [r.sum_r for r in rows] == [10 * 192, 30 * 192, 50 * 192]
    assert [r.sum_b for r in rows] == [10 * 192, 30 * 192, 50 * 192]
