"""Graph metrics (degree/triangles/PageRank) and CDC apply."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from sfdata_wrangler_spark.operators.cdc import apply_changelog
from sfdata_wrangler_spark.operators.graph import (
    cooccurrence_edges,
    degree_table,
    pagerank,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_degree_hand_computed(spark):
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    deg = {r["node"]: r["degree"] for r in degree_table(e).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


def test_triangles_hand_computed(spark):
    # one triangle (1,2,3) plus a pendant edge
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert triangle_count(e).collect()[0]["n_triangles"] == 1
    # K4 has 4 triangles
    k4 = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    )
    assert triangle_count(k4).collect()[0]["n_triangles"] == 4


def test_triangles_random_vs_brute_force(spark):
    rng = np.random.default_rng(7)
    n = 30
    pairs = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, n, size=(120, 2))
            if a != b
        }
    )
    adj = np.zeros((n, n), dtype=bool)
    for a, b in pairs:
        adj[a, b] = adj[b, a] = True
    brute = sum(
        1
        for a in range(n)
        for b in range(a + 1, n)
        for c in range(b + 1, n)
        if adj[a, b] and adj[b, c] and adj[a, c]
    )
    got = triangle_count(_edges(spark, pairs)).collect()[0]["n_triangles"]
    assert got == brute


def test_cooccurrence_edges_bounded_by_basket(spark):
    rel = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "b"), (2, "c"), (3, "a")],
        ["basket", "member"],
    )
    e = sorted(map(tuple, cooccurrence_edges(rel, "basket", "member").collect()))
    assert e == [("a", "b"), ("a", "c"), ("b", "c")]


def test_pagerank_matches_numpy_power_method(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 4)]
    n, iters, d = 5, 10, 0.85
    got = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), d, iters).collect()}
    # numpy replica on the both-ways graph
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = A[b, a] = 1.0
    outd = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1 - d) / n + d * (A / outd[:, None]).T @ r
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-9)


def test_pagerank_sums_to_one(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    total = (
        pagerank(_edges(spark, pairs), 0.85, 8)
        .agg(F.sum("rank"))
        .collect()[0][0]
    )
    assert total == pytest.approx(1.0, rel=1e-9)


def _cdc_frames(spark):
    base = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0), (3, "carol", 30.0)],
        ["uid", "name", "score"],
    )
    changelog = spark.createDataFrame(
        [
            # update bob twice -> last wins
            (2, "U", 5, 1, "bobby", 21.0),
            (2, "U", 7, 1, "bob2", 22.0),
            # delete carol AFTER an update
            (3, "U", 6, 1, "c2", 31.0),
            (3, "D", 8, 1, None, None),
            # insert dave; same-seq tie broken by tiebreak column
            (4, "I", 9, 1, "dave-lo", 40.0),
            (4, "U", 9, 2, "dave-hi", 41.0),
        ],
        ["uid", "op", "seq", "tb", "name", "score"],
    )
    return base, changelog


def test_cdc_apply_hand_computed(spark):
    base, changelog = _cdc_frames(spark)
    out = apply_changelog(
        base, changelog, "uid", seq_cols=["seq", "tb"],
        payload_cols=["name", "score"],
    )
    got = {r["uid"]: (r["name"], r["score"]) for r in out.collect()}
    assert got == {
        1: ("alice", 10.0),     # untouched base row
        2: ("bob2", 22.0),      # latest update wins
        4: ("dave-hi", 41.0),   # insert then tie-broken update
    }  # carol deleted


def test_cdc_replay_determinism_under_repartition(spark):
    base, changelog = _cdc_frames(spark)
    a = apply_changelog(
        base, changelog, "uid", seq_cols=["seq", "tb"],
        payload_cols=["name", "score"],
    )
    b = apply_changelog(
        base.repartition(7), changelog.repartition(5), "uid",
        seq_cols=["seq", "tb"], payload_cols=["name", "score"],
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_micro_tracks_float_twin(spark):
    from sfdata_wrangler_spark.operators.graph import pagerank_micro

    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 4)]
    scale = 10**12
    micro = {
        r["node"]: r["r"]
        for r in pagerank_micro(
            _edges(spark, pairs), damping_pct=85, iters=10, scale=scale
        ).collect()
    }
    flt = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, pairs), 0.85, 10).collect()
    }
    # truncation loses < 1 unit per edge per round: micro/scale must
    # track the float method to ~1e-9 relative on this graph
    for node, r in flt.items():
        assert micro[node] / scale == pytest.approx(r, rel=1e-6)


def test_pagerank_micro_exact_under_repartition(spark):
    from sfdata_wrangler_spark.operators.graph import pagerank_micro

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (1, 3)]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(7)
    a = sorted(map(tuple, pagerank_micro(e1, iters=6).collect()))
    b = sorted(map(tuple, pagerank_micro(e2, iters=6).collect()))
    # integer arithmetic: EQUAL, not approximately equal
    assert a == b


def test_survivorship_merge_fields_independent(spark):
    import datetime as dt

    from sfdata_wrangler_spark.operators.cdc import survivorship_merge

    t0 = dt.datetime(2024, 9, 1)

    def r(uid, seq, name, phone):
        return (uid, t0 + dt.timedelta(days=seq), seq, name, phone)

    df = spark.createDataFrame(
        [
            r(1, 1, "alice", "555-0100"),
            r(1, 2, "alice b", None),      # newer, but null phone
            r(1, 3, None, "555-0199"),     # newest phone, null name
            r(2, 1, None, None),           # all-null entity fields
        ],
        "uid bigint, ts timestamp, seq bigint, name string, phone string",
    )
    out = {
        row.uid: row
        for row in survivorship_merge(
            df, "uid", "ts", "seq", ["name", "phone"]
        ).collect()
    }
    # each field independently takes its latest NON-NULL value
    assert out[1].name == "alice b"
    assert out[1].phone == "555-0199"
    assert out[1].n_records == 3
    assert (out[2].name, out[2].phone) == (None, None)


def test_survivorship_tie_break_deterministic(spark):
    import datetime as dt

    from sfdata_wrangler_spark.operators.cdc import survivorship_merge

    ts = dt.datetime(2024, 9, 2)
    df = spark.createDataFrame(
        [(1, ts, 1, "first"), (1, ts, 2, "second")],
        "uid bigint, ts timestamp, seq bigint, name string",
    )
    a = survivorship_merge(df, "uid", "ts", "seq", ["name"]).collect()[0]
    b = survivorship_merge(
        df.repartition(5), "uid", "ts", "seq", ["name"]
    ).collect()[0]
    # same ts: the (ts, seq) struct key breaks the tie the same way
    # regardless of partitioning
    assert a.name == b.name == "second"
