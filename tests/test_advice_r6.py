"""Regression tests for the four round-6 ADVICE findings:

1. funnel within_seconds -> µs must ROUND, not truncate (4.1 s is
   4_100_000 µs, not 4_099_999 — int() floors floats with inexact
   binary representation, shifting the inclusive boundary by 1 µs).
2. salted_join must exclude MapType at ANY nesting depth from the
   xxhash64 salt (array<map<...>> / struct<..., map> previously
   raised AnalysisException at plan time).
3. detect_silence must route bad blobs (non-16-bit / undecodable)
   to a marker row instead of crashing the whole job — the same
   route-don't-crash contract as the CSV/JSONL quarantine readers.
4. cache_scope() isolates operator persists so independent callers
   can't evict each other via release_operator_caches().
"""

import datetime as dt
import io
import struct
import wave

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators import cache_scope, release_operator_caches
from sfdata_wrangler_spark.operators.funnel import funnel_steps
from sfdata_wrangler_spark.operators.skew import salted_join


# --- 1. fractional within_seconds rounds to exact µs -----------------


def test_funnel_fractional_window_rounds_not_truncates(spark):
    # B lands EXACTLY 4.1 s after A. int(4.1 * 1e6) = 4_099_999 would
    # exclude it; round() = 4_100_000 includes it (inclusive boundary).
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            Row(user_id=1, ts=t0, event_type="A"),
            Row(user_id=1, ts=t0 + dt.timedelta(microseconds=4_100_000),
                event_type="B"),
        ]
    )
    row = funnel_steps(ev, ["A", "B"], within_seconds=4.1).collect()[0]
    assert row["t2"] is not None, "4.1 s boundary event must be inside"


# --- 2. salted_join with nested maps ---------------------------------


def test_salted_join_skips_nested_map_columns(spark):
    fact = spark.createDataFrame(
        [
            Row(k=1, v=10, tags=[{"a": 1}], meta=Row(m={"x": 2}, y=3)),
            Row(k=1, v=20, tags=[{"b": 5}], meta=Row(m={"z": 7}, y=4)),
            Row(k=2, v=30, tags=[], meta=Row(m={}, y=5)),
        ]
    )
    dim = spark.createDataFrame([Row(k=1, name="one"), Row(k=2, name="two")])
    out = salted_join(fact, dim, "k", salt_buckets=4)
    got = sorted((r["k"], r["v"], r["name"]) for r in out.collect())
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in fact.join(dim, "k").collect()
    )
    assert got == plain


# --- 3. detect_silence routes bad blobs ------------------------------


def _wav_bytes(samples, width=2, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:  # 8-bit unsigned
            w.writeframes(struct.pack(f"{len(samples)}B", *samples))
    return buf.getvalue()


def _silence_input(spark):
    good = _wav_bytes([0, 0, 0, 0, 0, 5000, 5000, 0, 0, 0, 0, 0])
    bad_width = _wav_bytes([128] * 16, width=1)
    garbage = b"not a wav file at all"
    return spark.createDataFrame(
        [
            Row(media_id=1, content=bytearray(good)),
            Row(media_id=2, content=bytearray(bad_width)),
            Row(media_id=3, content=bytearray(garbage)),
        ]
    )


def test_detect_silence_routes_bad_files(spark):
    from sfdata_wrangler_spark.multimodal.audio_wav import detect_silence

    rows = detect_silence(
        _silence_input(spark), threshold=50, min_run=4
    ).collect()
    errs = sorted(r["media_id"] for r in rows if r["run_idx"] == -1)
    good = [r for r in rows if r["run_idx"] >= 1]
    assert errs == [2, 3]
    for r in rows:
        if r["run_idx"] == -1:
            assert r["start_frame"] is None and r["n_frames"] is None
    # the good file still yields its two silence runs
    assert sorted((r["start_frame"], r["end_frame"]) for r in good) == [
        (0, 4),
        (7, 11),
    ]


def test_detect_silence_raise_mode_still_fails_fast(spark):
    from sfdata_wrangler_spark.multimodal.audio_wav import detect_silence

    with pytest.raises(Exception):
        detect_silence(
            _silence_input(spark), threshold=50, min_run=4, on_error="raise"
        ).collect()


# --- 4. cache_scope isolation -----------------------------------------


def test_cache_scope_releases_only_its_own_persists(spark):
    from sfdata_wrangler_spark.operators._cache import tracked_persist

    release_operator_caches()  # isolate from other tests' leftovers
    sc = spark.sparkContext._jsc.sc()
    base = sc.getPersistentRDDs().size()

    outer = tracked_persist(spark.range(10).withColumn("a", F.lit(1)))
    outer.count()
    with cache_scope() as handles:
        inner = tracked_persist(spark.range(20).withColumn("b", F.lit(2)))
        inner.count()
        assert len(handles) == 1
        assert sc.getPersistentRDDs().size() >= base + 2
    # scope exit released the inner persist only
    assert inner.storageLevel.useMemory is False
    assert outer.storageLevel.useMemory is True
    # global sweep still owns (and frees) the unscoped persist
    assert release_operator_caches() == 1
    assert sc.getPersistentRDDs().size() <= base
