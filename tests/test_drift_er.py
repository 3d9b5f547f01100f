"""Drift QC, MAD outliers, EWMA, compaction plan, image patches,
entity-resolution differential."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from sfdata_wrangler_spark.operators.compaction import plan_compaction
from sfdata_wrangler_spark.operators.drift import chisq_drift, mad_outliers
from sfdata_wrangler_spark.operators.windows import ewma_bounded


def test_chisq_no_drift_is_zero(spark):
    # identical category mix in both cohorts -> every term 0
    rows = [(c, r) for c in "ab" for r in (True, False) for _ in range(10)]
    df = spark.createDataFrame(rows, ["cat", "ref"])
    out = chisq_drift(df, "cat", F.col("ref"))
    for r in out.collect():
        assert r["chisq_term"] == pytest.approx(0.0, abs=1e-12)


def test_chisq_hand_computed(spark):
    # ref: 30 a, 10 b ; cur: 10 a, 30 b
    rows = (
        [("a", True)] * 30 + [("b", True)] * 10
        + [("a", False)] * 10 + [("b", False)] * 30
    )
    df = spark.createDataFrame(rows, ["cat", "ref"])
    out = {r["category"]: r for r in chisq_drift(df, "cat", F.col("ref")).collect()}
    # each category: total 40, expected 20/20 -> (30-20)^2/20 + (10-20)^2/20 = 10
    for c in "ab":
        assert out[c]["chisq_term"] == pytest.approx(10.0)
        assert out[c]["exp_ref"] == pytest.approx(20.0)


def test_mad_outliers_hand_computed(spark):
    vals = [10.0] * 5 + [11.0] * 5 + [9.0] * 5 + [100.0]  # one wild row
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    row = mad_outliers(df, "grp", "v", k=3.0).collect()[0]
    assert row["med"] == 10.0
    assert row["mad"] == 1.0
    assert row["n_outliers"] == 1  # only the 100.0


def test_mad_outliers_constant_group(spark):
    df = spark.createDataFrame([("g", 5.0)] * 10 + [("g", 6.0)], ["grp", "v"])
    row = mad_outliers(df, "grp", "v", k=3.0).collect()[0]
    assert row["mad"] == 0.0
    assert row["n_outliers"] == 1  # any x != median breaches a 0 fence


def test_ewma_matches_sequential(spark):
    vals = [1.0, 2.0, 4.0, 8.0, 3.0, 5.0, 7.0, 9.0, 2.0, 6.0]
    df = spark.createDataFrame(
        [("u", i, v) for i, v in enumerate(vals)], ["u", "i", "v"]
    )
    out = {
        r["i"]: r["ewma"]
        for r in ewma_bounded(df, ["u"], ["i"], "v", depth=8).collect()
    }
    for i in range(len(vals)):
        expect = sum(
            vals[i - k] / 2 ** (k + 1) for k in range(8) if i - k >= 0
        )
        assert out[i] == pytest.approx(expect, rel=1e-12)


def test_compaction_plan_hand_computed(spark):
    manifest = spark.createDataFrame(
        [("p", "a", 30), ("p", "b", 40), ("p", "c", 50), ("p", "d", 10),
         ("q", "a", 500)],
        ["pt", "f", "sz"],
    )
    out = {
        (r["pt"], r["f"]): r["compaction_group"]
        for r in plan_compaction(manifest, ["pt"], "f", "sz", 60).collect()
    }
    # p: cum_before a=0,b=30,c=70,d=120 -> groups 0,0,1,2
    assert out == {
        ("p", "a"): 0, ("p", "b"): 0, ("p", "c"): 1, ("p", "d"): 2,
        ("q", "a"): 0,
    }


def test_compaction_groups_reach_target(spark):
    import random

    rng = random.Random(3)
    rows = [("p", f"f{i:03d}", rng.randint(1, 120)) for i in range(60)]
    manifest = spark.createDataFrame(rows, ["pt", "f", "sz"])
    out = plan_compaction(manifest, ["pt"], "f", "sz", 200).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["compaction_group"], 0)
        by_group[r["compaction_group"]] += r["sz"]
    last = max(by_group)
    # every group except the last holds >= target before its last file
    # lands => with single files < target, group size > target - max_file
    for g, size in by_group.items():
        if g != last:
            assert size >= 200 - 120


def test_patchify_matches_numpy(spark):
    from sfdata_wrangler_spark.multimodal.image_bmp import (
        patchify_bmp,
        synth_bmp_corpus,
        synth_pixels,
    )

    ids = spark.createDataFrame([(m,) for m in (0, 5, 11)], ["media_id"])
    got = {
        (r["media_id"], r["py"], r["px"]): (r["sum_r"], r["sum_g"], r["sum_b"])
        for r in patchify_bmp(synth_bmp_corpus(ids), patch=8).collect()
    }
    expect = {}
    for m in (0, 5, 11):
        img = synth_pixels(m).astype(np.int64)
        h, w, _ = img.shape
        for py in range(h // 8):
            for px in range(w // 8):
                blk = img[py * 8:(py + 1) * 8, px * 8:(px + 1) * 8]
                s = blk.sum(axis=(0, 1))
                expect[(m, py, px)] = (int(s[0]), int(s[1]), int(s[2]))
    assert got == expect


def test_entity_resolution_matches_union_find(spark):
    """cluster_duplicates over fuzzy pairs ≡ driver-side union-find."""
    from sfdata_wrangler_spark.operators.dedup import cluster_duplicates
    from sfdata_wrangler_spark.operators.linkage import blocked_fuzzy_pairs

    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    pairs = blocked_fuzzy_pairs(part, "p_name", max_distance=2)
    pair_rows = [(r["name_a"], r["name_b"]) for r in pairs.collect()]
    clusters = cluster_duplicates(pairs, "name_a", "name_b")
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pair_rows:
        union(a, b)
    expect = {}
    for node in parent:
        # canonical = min member of the component
        root = find(node)
        expect[node] = min(expect.get(root, root), root)
    # remap each node to min-of-component
    comp_min = {}
    for node in parent:
        comp_min.setdefault(find(node), []).append(node)
    expect = {
        n: min(members)
        for root, members in comp_min.items()
        for n in members
    }
    assert got == expect


class TestRollingZscore:
    def test_spike_detected_baseline_excluded(self, spark):
        import datetime as dt
        import statistics

        from sfdata_wrangler_spark.operators.drift import rolling_zscore

        t0 = dt.datetime(2024, 1, 1)
        vals = [10.0] * 10 + [10.5, 25.0]
        rows = [
            ("g", t0 + dt.timedelta(minutes=i), i, v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "g string, ts timestamp, id int, v double"
        )
        out = {r.id: r for r in rolling_zscore(
            df, "g", "ts", "id", "v", window_n=10
        ).collect()}
        # constant baseline: zero variance -> NULL z, no alarm
        assert out[5].z is None and out[5].alarm is False
        # the wiggle point scores against constants: zero variance
        assert out[10].z is None
        # the spike scores against [10]*9 + [10.5] — exact match with
        # the sequential formula (self-excluded)
        base = [10.0] * 9 + [10.5]
        want = (25.0 - statistics.mean(base)) / statistics.stdev(base)
        assert abs(out[11].z - want) < 1e-9
        assert out[11].alarm is True

    def test_first_rows_null(self, spark):
        import datetime as dt

        from sfdata_wrangler_spark.operators.drift import rolling_zscore

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("g", t0 + dt.timedelta(minutes=i), i, float(i)) for i in range(3)],
            "g string, ts timestamp, id int, v double",
        )
        out = {r.id: r.z for r in rolling_zscore(
            df, "g", "ts", "id", "v", window_n=5
        ).collect()}
        assert out[0] is None and out[1] is None  # < 2 predecessors
        assert out[2] is not None
