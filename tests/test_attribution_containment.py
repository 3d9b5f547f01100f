"""Multi-touch attribution and containment dedup."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from sfdata_wrangler_spark.operators.attribution import (
    multitouch_attribution,
)
from sfdata_wrangler_spark.operators.dedup import containment_pairs


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _frames(spark, touch_minutes, conv_minute=50, value=10.0):
    touches = spark.createDataFrame(
        [("u", _ts(m), 100 + i) for i, m in enumerate(touch_minutes)],
        "user_id string, ts timestamp, event_id long",
    )
    conv = spark.createDataFrame(
        [("u", _ts(conv_minute), 900, value)],
        "user_id string, ts timestamp, event_id long, value double",
    )
    return touches, conv


def test_single_touch_gets_full_credit(spark):
    t, c = _frames(spark, [10])
    rows = multitouch_attribution(t, c).collect()
    assert len(rows) == 1
    assert rows[0]["weight"] == 1.0
    assert rows[0]["credited"] == 10.0


def test_two_touches_split_evenly(spark):
    t, c = _frames(spark, [10, 20])
    rows = multitouch_attribution(t, c).collect()
    assert sorted(r["weight"] for r in rows) == [0.5, 0.5]


def test_u_shape_weights(spark):
    t, c = _frames(spark, [5, 10, 15, 20, 25])  # 5 touches
    rows = {r["position"]: r for r in multitouch_attribution(t, c).collect()}
    assert rows[1]["weight"] == pytest.approx(0.4)
    assert rows[5]["weight"] == pytest.approx(0.4)
    for p in (2, 3, 4):
        assert rows[p]["weight"] == pytest.approx(0.2 / 3)
    total = sum(r["credited"] for r in rows.values())
    assert total == pytest.approx(10.0)  # credit conserved


def test_lookback_and_strict_before(spark):
    # touch at the conversion instant and one 8 days earlier both drop
    touches = spark.createDataFrame(
        [
            ("u", dt.datetime(2024, 1, 9, 0, 50), 1),   # simultaneous
            ("u", dt.datetime(2024, 1, 1, 0, 0), 2),    # > 7d before
            ("u", dt.datetime(2024, 1, 5, 0, 0), 3),    # in window
        ],
        "user_id string, ts timestamp, event_id long",
    )
    conv = spark.createDataFrame(
        [("u", dt.datetime(2024, 1, 9, 0, 50), 900, 4.0)],
        "user_id string, ts timestamp, event_id long, value double",
    )
    rows = multitouch_attribution(touches, conv).collect()
    assert [r["touch_id"] for r in rows] == [3]
    assert rows[0]["weight"] == 1.0


def _docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "delta epsilon zeta"  # inside base
    return spark.createDataFrame(
        [
            (1, base),
            (2, quote + " unrelated words here padding tokens"),
            (3, "completely different text with no overlap at all ok"),
            (4, base),  # exact dup of 1
        ],
        "doc_id long, text string",
    )


def test_containment_catches_doc_in_doc(spark):
    out = {
        (r["id_a"], r["id_b"]): r["containment_pct"]
        for r in containment_pairs(
            _docs(spark), min_containment_pct=10
        ).collect()
    }
    assert out[(1, 4)] == 100  # exact dup
    assert (1, 2) in out  # the quoted span registers
    assert all(p != (1, 3) for p in out)  # disjoint docs absent


def test_containment_asymmetry_vs_jaccard(spark):
    # quote (3 shingles from doc 1's 8) -> containment from doc 2 side
    out = containment_pairs(_docs(spark), min_containment_pct=10)
    row = out.where((F.col("id_a") == 1) & (F.col("id_b") == 2)).collect()[0]
    jaccard_pct = 100 * row["inter"] // (row["n_a"] + row["n_b"] - row["inter"])
    assert row["containment_pct"] > jaccard_pct  # the asymmetric score sees it


def test_containment_threshold_is_exact_integer(spark):
    docs = _docs(spark)
    lo = containment_pairs(docs, min_containment_pct=10).count()
    hi = containment_pairs(docs, min_containment_pct=101).count()
    assert hi == 0 and lo >= 2


class TestTimedecayAttribution:
    def test_halving_per_day_and_conservation(self, spark):
        import datetime as dt

        from sfdata_wrangler_spark.operators.attribution import (
            timedecay_attribution,
        )

        conv_t = dt.datetime(2024, 8, 10, 12, 0)
        touches = spark.createDataFrame(
            [
                (1, 100, conv_t - dt.timedelta(hours=2)),   # age 0
                (1, 101, conv_t - dt.timedelta(days=1, hours=1)),  # age 1
                (1, 102, conv_t - dt.timedelta(days=3)),    # age 3
            ],
            "user_id bigint, event_id bigint, ts timestamp",
        )
        convs = spark.createDataFrame(
            [(1, 500, conv_t, 88.0)],
            "user_id bigint, event_id bigint, ts timestamp, value double",
        )
        out = {
            r.touch_id: r
            for r in timedecay_attribution(touches, convs).collect()
        }
        # raw weights 2^7, 2^6, 2^4 -> 128:64:16 = 8/13, 4/13, 1/13
        assert out[100].weight == 128 / 208
        assert out[101].weight == 64 / 208
        assert out[102].weight == 16 / 208
        assert sum(r.weight for r in out.values()) == 1.0
        assert sum(r.credited for r in out.values()) == pytest.approx(
            88.0, abs=1e-9
        )

    def test_out_of_window_touch_excluded(self, spark):
        import datetime as dt

        from sfdata_wrangler_spark.operators.attribution import (
            timedecay_attribution,
        )

        conv_t = dt.datetime(2024, 8, 10, 12, 0)
        touches = spark.createDataFrame(
            [(1, 100, conv_t - dt.timedelta(days=8))],
            "user_id bigint, event_id bigint, ts timestamp",
        )
        convs = spark.createDataFrame(
            [(1, 500, conv_t, 10.0)],
            "user_id bigint, event_id bigint, ts timestamp, value double",
        )
        assert timedecay_attribution(touches, convs).count() == 0
