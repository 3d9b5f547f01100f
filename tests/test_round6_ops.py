"""Round-6 operator units: salted join equivalence, mergeable
reservoir, odds encoding, LSH calibration curve, silence runs, and
the funnel-episode cap."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from sfdata_wrangler_spark.operators.dedup import lsh_calibration
from sfdata_wrangler_spark.operators.encode import woe_odds_encode
from sfdata_wrangler_spark.operators.sampling import reservoir_sample
from sfdata_wrangler_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    fact = spark.createDataFrame(
        [Row(k=i % 3, v=i) for i in range(100)]
    )
    dim = spark.createDataFrame(
        [Row(k=0, name="a"), Row(k=1, name="b"), Row(k=5, name="zz")]
    )
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.name)
            for r in salted_join(fact, dim, "k", salt_buckets=4, how=how)
            .collect()
        )
        ref = sorted(
            (r.k, r.v, r.name) for r in fact.join(dim, "k", how).collect()
        )
        assert got == ref, how


def test_salted_join_rejects_right_full(spark):
    df = spark.createDataFrame([Row(k=1)])
    import pytest

    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_reservoir_sample_is_mergeable_bottom_k(spark):
    """The KMV property the docstring claims: bottom-k of the union
    == bottom-k of the shards' bottom-k's."""
    rows = [Row(g=i % 2, key=i) for i in range(200)]
    full = spark.createDataFrame(rows)
    shard_a = spark.createDataFrame(rows[:97])
    shard_b = spark.createDataFrame(rows[97:])

    direct = {
        (r.g, r.key)
        for r in reservoir_sample(full, ["g"], 7, "key").collect()
    }
    merged_input = reservoir_sample(shard_a, ["g"], 7, "key").select(
        "g", "key"
    ).unionByName(
        reservoir_sample(shard_b, ["g"], 7, "key").select("g", "key")
    )
    merged = {
        (r.g, r.key)
        for r in reservoir_sample(merged_input, ["g"], 7, "key").collect()
    }
    assert direct == merged
    # per-group sizes are exactly k
    assert sum(1 for g, _ in direct if g == 0) == 7
    assert sum(1 for g, _ in direct if g == 1) == 7


def test_woe_odds_encode_hand_computed(spark):
    # key A: 3 good, 1 bad; key B: 1 good, 3 bad; smoothing 1
    rows = [Row(k="A", y=1)] * 3 + [Row(k="A", y=0)] + [
        Row(k="B", y=1)
    ] + [Row(k="B", y=0)] * 3
    out = {r.k: r for r in woe_odds_encode(
        spark.createDataFrame(rows), "k", "y"
    ).collect()}
    gt, bt = (3 + 1) + (1 + 1), (1 + 1) + (3 + 1)  # smoothed totals
    assert out["A"].n == 4 and out["A"].n_good == 3
    assert out["A"].odds_micro == ((3 + 1) * bt * 1_000_000) // ((1 + 1) * gt)
    assert out["B"].odds_micro == ((1 + 1) * bt * 1_000_000) // ((3 + 1) * gt)
    # symmetry: A's odds ratio is the inverse of B's (same smoothed counts)
    assert abs(out["A"].odds_micro * out["B"].odds_micro - 1e12) < 2e6


def test_lsh_calibration_matches_closed_form(spark):
    got = {
        r.s_pct: r.p_candidate_micro
        for r in lsh_calibration(spark, bands=4, rows_per_band=2).collect()
    }
    for s_pct, p_micro in got.items():
        s = s_pct / 100.0
        expected = 1 - (1 - s * s) ** 4
        assert abs(p_micro - round(expected * 1_000_000)) <= 1
    # monotone increasing S-curve with the documented inflection zone
    vals = [got[s] for s in sorted(got)]
    assert vals == sorted(vals)
    assert got[5] < 20_000 and got[95] > 999_000


def test_detect_silence_runs(spark):
    from sfdata_wrangler_spark.multimodal.audio_wav import (
        detect_silence,
        encode_pcm16_wav,
    )

    # loud(5) quiet(6) loud(3) quiet(4) quiet-but-short(2 at end)
    samples = (
        [500] * 5 + [10] * 6 + [-400] * 3 + [0] * 4 + [900] * 2 + [3] * 2
    )
    df = spark.createDataFrame(
        [Row(media_id=7, content=bytearray(encode_pcm16_wav(samples)))]
    )
    rows = sorted(
        detect_silence(df, threshold=50, min_run=4).collect(),
        key=lambda r: r.run_idx,
    )
    assert [(r.run_idx, r.start_frame, r.end_frame, r.n_frames) for r in rows] == [
        (1, 5, 10, 6),
        (2, 14, 17, 4),
    ]


def test_funnel_episodes_cap(spark):
    """max_episodes bounds the output: a user with 3 episodes keeps
    exactly 2 rows under max_episodes=2 (the earliest two)."""
    import datetime

    from sfdata_wrangler_spark.operators.funnel import funnel_episodes

    t0 = datetime.datetime(2024, 1, 1)

    def ev(kind, minute):
        return Row(
            user_id=1,
            event_type=kind,
            ts=t0 + datetime.timedelta(minutes=minute),
        )

    df = spark.createDataFrame(
        [ev("A", 0), ev("A", 120), ev("A", 240), ev("B", 5)]
    )
    out = funnel_episodes(
        df, ["A", "B"], within_seconds=3600.0, max_episodes=2
    )
    rows = sorted(out.collect(), key=lambda r: r.episode)
    assert [r.episode for r in rows] == [1, 2]
    assert rows[0].t1 == t0
    assert rows[0].t2 == t0 + datetime.timedelta(minutes=5)
    assert rows[1].t1 == t0 + datetime.timedelta(minutes=120)
    assert rows[1].t2 is None


def test_benford_micro_constants():
    from sfdata_wrangler_spark.operators.profile import BENFORD_MICRO

    assert sum(BENFORD_MICRO.values()) in (999_999, 1_000_000, 1_000_001)
    assert BENFORD_MICRO[1] == round(math.log10(2) * 1_000_000)


def test_woe_odds_encode_survives_bigint_overflow_scale(spark):
    """g*bt*1e6 exceeds 2^63 at ~20M rows — the arithmetic must run
    in wide decimals, not wrap (code-review r6 finding)."""
    g_a, b_b = 4_000_000, 3_000_000
    df = (
        spark.range(g_a)
        .select(F.lit("A").alias("k"), F.lit(1).alias("y"))
        .unionAll(
            spark.range(b_b).select(F.lit("B").alias("k"), F.lit(0).alias("y"))
        )
    )
    out = {r.k: r.odds_micro for r in woe_odds_encode(df, "k", "y").collect()}
    gt, bt = (g_a + 1) + 1, 1 + (b_b + 1)
    assert out["A"] == ((g_a + 1) * bt * 1_000_000) // (1 * gt)
    assert out["A"] > 0  # the wrapped BIGINT form went negative


def test_salted_join_spreads_hot_key_rows(spark):
    """A hot key's DISTINCT rows must spread across salt buckets
    (deterministic row hash), and byte-identical duplicates spread
    when the caller names a unique row id. The salt expression must
    be DETERMINISTIC (no per-row counter): a nondeterministic shuffle
    key drops/duplicates rows under task retry (review r6)."""
    from pyspark.sql import Row as R

    # distinct rows on one hot key -> full-row hash spreads them
    fact = spark.createDataFrame([R(k=1, v=i) for i in range(64)])
    dim = spark.createDataFrame([R(k=1, name="hot")])
    assert salted_join(fact, dim, "k", salt_buckets=8).count() == 64
    from pyspark.sql.types import MapType

    cols = [
        F.col(f.name)
        for f in fact.schema.fields
        if not isinstance(f.dataType, MapType)
    ]
    salt = F.pmod(F.xxhash64(*cols), F.lit(8))
    assert fact.select(salt.alias("s")).distinct().count() >= 4

    # byte-identical duplicates: share a salt by default (documented),
    # spread when a unique row id is supplied
    dups = spark.createDataFrame([R(k=1, rid=i) for i in range(64)])
    out = salted_join(dups, dim, "k", salt_buckets=8, row_id_col="rid")
    assert out.count() == 64
    rid_salt = F.pmod(F.xxhash64(F.col("k"), F.col("rid")), F.lit(8))
    assert dups.select(rid_salt.alias("s")).distinct().count() >= 4


def test_sliding_distinct_hll_equals_window_resketch(spark):
    """The sliding assembly (replicate + max-merge DAILY registers)
    must equal sketching each window's raw events directly — register
    max-merge is lossless, so the two estimates are IDENTICAL, not
    just close."""
    import datetime

    from sfdata_wrangler_spark.operators.hll import (
        hll_estimate,
        hll_sketch,
        sliding_distinct_hll,
    )

    t0 = datetime.datetime(2024, 3, 1)
    # cardinality must sit ABOVE the raw-HLL small-range regime
    # (~5/2 * m = 640 for m = 256 registers): the engine's estimator
    # deliberately omits the HLL++ low-range correction
    rows = [
        Row(
            user_id=(d * 131 + i * 17) % 4000,
            ts=t0 + datetime.timedelta(days=d, minutes=i),
        )
        for d in range(10)
        for i in range(700)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.window_end: r.hll_est
        for r in sliding_distinct_hll(df, "ts", "user_id", window_days=7).collect()
    }
    assert len(got) == 10
    for d in (0, 4, 9):
        end = t0 + datetime.timedelta(days=d)
        lo = end - datetime.timedelta(days=6)
        win = df.where(
            (F.date_trunc("day", "ts") >= lo) & (F.date_trunc("day", "ts") <= end)
        )
        direct = hll_estimate(
            hll_sketch(win, [], "user_id"), []
        ).collect()[0]["hll_est"]
        assert got[end.strftime("%Y-%m-%d")] == direct
        # and the estimate is sane vs exact distinct
        exact = win.select("user_id").distinct().count()
        assert abs(direct - exact) / exact < 0.25


def test_sliding_distinct_hll_scans_events_once(spark):
    """The sliding assembly must be ONE consumer chain over ONE fact
    scan — the observed-day filter rides through the estimate
    aggregation instead of re-reading events (r6 plan audit)."""
    from sfdata_wrangler_spark.operators.hll import sliding_distinct_hll

    # read through the catalog loader (ts normalization)
    from sfdata_wrangler_spark.plans.catalog import _events

    df = _events(spark, "/root/testdata/sf0.001").select("ts", "user_id")
    out = sliding_distinct_hll(df, "ts", "user_id", window_days=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan


def test_sliding_distinct_hll_includes_gap_days_but_not_trailing(spark):
    """An interior day with no events of its own still gets a row
    (its window covers the preceding days' users); window ends past
    the last observed day do not (code-review r6 finding)."""
    import datetime

    from sfdata_wrangler_spark.operators.hll import sliding_distinct_hll

    t0 = datetime.datetime(2024, 3, 1)
    rows = [
        Row(user_id=u, ts=t0 + datetime.timedelta(days=d, minutes=u))
        for d in (0, 1, 3)  # gap at day 2
        for u in range(20)
    ]
    got = {
        r.window_end
        for r in sliding_distinct_hll(
            spark.createDataFrame(rows), "ts", "user_id", window_days=7
        ).collect()
    }
    assert got == {"2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"}


def test_canonical_keep_policy(spark):
    """Per exact-dup cluster: highest quality wins, then lowest id;
    dup_count reports cluster size; non-duplicates pass through."""
    from sfdata_wrangler_spark.operators.dedup import canonical_keep

    rows = [
        Row(doc_id=1, text="Hello  World", q=5),
        Row(doc_id=2, text="hello world", q=9),   # same cluster, best q
        Row(doc_id=3, text="HELLO WORLD", q=9),   # tie -> loses on id
        Row(doc_id=4, text="something else", q=1),
    ]
    out = {
        r.doc_id: r.dup_count
        for r in canonical_keep(
            spark.createDataFrame(rows), quality_col="q"
        ).collect()
    }
    assert out == {2: 3, 4: 1}


def test_detect_silence_stereo_and_width_guard(spark):
    """Stereo frames are silent only when BOTH channels are (frame
    indices stay frame-granular), and non-16-bit input raises instead
    of decoding garbage (code-review r6)."""
    import io
    import struct
    import wave

    import pytest

    from sfdata_wrangler_spark.multimodal.audio_wav import detect_silence

    def stereo_wav(pairs):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            flat = [s for pair in pairs for s in pair]
            w.writeframes(struct.pack(f"<{len(flat)}h", *flat))
        return buf.getvalue()

    # frames: 3 loud, 5 both-quiet, 2 one-channel-loud, 4 both-quiet
    pairs = (
        [(500, 0)] * 3
        + [(10, -10)] * 5
        + [(0, 900)] * 2
        + [(5, 5)] * 4
    )
    df = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(stereo_wav(pairs)))]
    )
    rows = sorted(
        detect_silence(df, threshold=50, min_run=4).collect(),
        key=lambda r: r.run_idx,
    )
    assert [
        (r.run_idx, r.start_frame, r.end_frame, r.n_frames) for r in rows
    ] == [(1, 3, 7, 5), (2, 10, 13, 4)]

    def wav8(n):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes([128] * n))
        return buf.getvalue()

    bad = spark.createDataFrame(
        [Row(media_id=2, content=bytearray(wav8(16)))]
    )
    # default routes the bad file to a marker row (ADVICE r6);
    # on_error="raise" keeps the fail-fast contract
    routed = detect_silence(bad).collect()
    assert [(r.media_id, r.run_idx) for r in routed] == [(2, -1)]
    with pytest.raises(Exception, match="16-bit"):
        detect_silence(bad, on_error="raise").collect()
