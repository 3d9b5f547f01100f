"""Viterbi map-matching on a toy grid network (G1-G6)."""

import datetime
import itertools

from pyspark.sql import Row

from sfdata_wrangler_spark.pipelines.mapmatch import (
    LEFT_TURN_PENALTY,
    RIGHT_TURN_PENALTY,
    THETA_PATH,
    THETA_POINT,
    U_TURN_PENALTY,
    Link,
    Network,
    match_trips,
    turn_penalty,
)
from sfdata_wrangler_spark.pipelines.taxi import aggregate_link_times


def _grid_network():
    """Two parallel horizontal roads (y=0 and y=1000), 3 links each,
    1000 ft per link, 10 mph-ish fftt = 68 s."""
    links = {}
    lid = 0
    for y in (0.0, 1000.0):
        for i in range(3):
            lid += 1
            links[lid] = Link(lid, i * 1000.0, y, (i + 1) * 1000.0, y, 68.0)
    # connect the roads with a vertical link at x=3000 (end of road 1
    # up to road 2) so paths exist between them
    lid += 1
    links[lid] = Link(lid, 3000.0, 0.0, 3000.0, 1000.0, 68.0)
    return Network(links).build()


def _pings(spark):
    """Trip along the y=0 road: pings 30 ft off the road, one per
    link + endpoints."""
    t0 = datetime.datetime(2024, 1, 1, 9, 0)
    rows = []
    for i, x in enumerate([100.0, 1100.0, 2100.0, 2900.0]):
        rows.append(
            Row(
                cab_id=7,
                trip_id=1,
                time=t0 + datetime.timedelta(seconds=70 * i),
                x=x,
                y=30.0,
            )
        )
    return spark.createDataFrame(rows)


def test_candidates_within_150ft():
    net = _grid_network()
    cand = net.candidates(500.0, 30.0)
    assert cand and cand[0][0] == 1  # nearest = first link of road 1
    assert all(d <= 150.0 for (_, _, d) in cand)
    assert net.candidates(500.0, 500.0) == []  # mid-gap: nothing in range


def test_skim_paths():
    net = _grid_network()
    assert net.fftt_between(1, 3) == 136.0  # two downstream links
    assert net.path(1, 3) == [1, 2, 3]
    # road 2 is reachable from road 1 only via the vertical connector
    assert net.path(1, 4) is None  # link 4 is upstream on road 2 (one-way)


def test_turn_penalty_classification():
    east = Link(1, 0.0, 0.0, 1000.0, 0.0, 30.0)
    north = Link(2, 1000.0, 0.0, 1000.0, 1000.0, 30.0)
    south = Link(3, 1000.0, 0.0, 1000.0, -1000.0, 30.0)
    east2 = Link(4, 1000.0, 0.0, 2000.0, 0.0, 30.0)
    west = Link(5, 1000.0, 0.0, 0.0, 0.0, 30.0)
    assert turn_penalty(east, north) == LEFT_TURN_PENALTY
    assert turn_penalty(east, south) == RIGHT_TURN_PENALTY
    assert turn_penalty(east, east2) == 0.0
    assert turn_penalty(east, west) == U_TURN_PENALTY


def test_skim_turn_penalties_hand_computed():
    """Bidirectional street + a side street: skim costs match the
    hand-computed fftt + HwyNetwork.py:129-131 penalties."""
    links = {
        # eastbound E1 E2, westbound W1 W2 (Wi runs i*1000 -> (i-1)*1000)
        1: Link(1, 0.0, 0.0, 1000.0, 0.0, 30.0),
        2: Link(2, 1000.0, 0.0, 2000.0, 0.0, 30.0),
        11: Link(11, 1000.0, 0.0, 0.0, 0.0, 30.0),
        12: Link(12, 2000.0, 0.0, 1000.0, 0.0, 30.0),
        # side streets leaving the x=2000 node
        21: Link(21, 2000.0, 0.0, 2000.0, 1000.0, 40.0),  # north (left)
        22: Link(22, 2000.0, 0.0, 2000.0, -1000.0, 40.0),  # south (right)
    }
    net = Network(links).build()
    # E1 -> W1: U-turn at x=1000 onto W1: 30 (W1 tt) + 60 (U)
    assert net.fftt_between(1, 11) == 30.0 + U_TURN_PENALTY
    # E1 -> W2: straight to E2 (30), U-turn onto W2 (30 + 60) = 120
    assert net.fftt_between(1, 12) == 120.0
    assert net.path(1, 12) == [1, 2, 12]
    # E1 -> north side street: straight + left turn: 30 + 40 + 30
    assert net.fftt_between(1, 21) == 30.0 + 40.0 + LEFT_TURN_PENALTY
    # E1 -> south side street: straight + right turn: 30 + 40 + 10
    assert net.fftt_between(1, 22) == 30.0 + 40.0 + RIGHT_TURN_PENALTY


def _brute_force_viterbi(net, states, times):
    """Independent mirror of Trajectory.py:37-86 scoring: enumerate
    every candidate assignment, score = THETA dot (path, point)
    features, maximize. Only viable on toy fixtures."""
    best, best_seq = None, None
    for assign in itertools.product(*[range(len(s)) for s in states]):
        score = 0.0
        ok = True
        for i, j in enumerate(assign):
            score += THETA_POINT * -states[i][j][2]
            if i == 0:
                continue
            plid = states[i - 1][assign[i - 1]][0]
            lid = states[i][j][0]
            dt = (times[i] - times[i - 1]).total_seconds()
            fftt = 0.0 if plid == lid else net.fftt_between(plid, lid)
            if fftt is None:
                ok = False
                break
            score += THETA_PATH * -(fftt + max(0.0, fftt - dt))
        if ok and (best is None or score > best):
            best, best_seq = score, assign
    return best_seq


def test_viterbi_matches_brute_force(spark):
    """The distributed Viterbi picks exactly the argmax assignment the
    exhaustive scorer finds, on a fixture where pings sit between two
    parallel roads (several live candidates per ping) and the turn
    penalties decide against zig-zagging."""
    links = {}
    lid = 0
    for y in (0.0, 200.0):  # two close parallel eastbound roads
        for i in range(4):
            lid += 1
            links[lid] = Link(lid, i * 500.0, y, (i + 1) * 500.0, y, 20.0)
    # connectors between the roads at every node (both directions)
    for i in range(5):
        lid += 1
        links[lid] = Link(lid, i * 500.0, 0.0, i * 500.0, 200.0, 15.0)
        lid += 1
        links[lid] = Link(lid, i * 500.0, 200.0, i * 500.0, 0.0, 15.0)
    net = Network(links).build()

    t0 = datetime.datetime(2024, 1, 1, 8, 0)
    # pings drift between the roads (y 60..140): both roads' links are
    # candidates each time; irregular offsets avoid score ties
    ping_xy = [(100.0, 63.0), (600.0, 97.0), (1100.0, 141.0),
               (1600.0, 119.0)]
    times = [t0 + datetime.timedelta(seconds=30 * i) for i in range(4)]
    states = [net.candidates(x, y) for x, y in ping_xy]
    assert all(len(s) >= 2 for s in states), "fixture must be ambiguous"

    expect_assign = _brute_force_viterbi(net, states, times)
    expect_links = [s[j][0] for s, j in zip(states, expect_assign)]

    pings = spark.createDataFrame(
        [
            Row(cab_id=1, trip_id=9, time=t, x=x, y=y)
            for t, (x, y) in zip(times, ping_xy)
        ]
    )
    out = match_trips(pings, net).collect()
    assert out, "match must succeed"
    # expand the brute-force per-ping choices through the same G6 path
    # expansion the pipeline applies, then compare traversed links
    expect_traversed = set()
    for i in range(1, len(expect_links)):
        a, b = expect_links[i - 1], expect_links[i]
        seg = [a] if a == b else (net.path(a, b) or [a, b])
        expect_traversed.update(seg)
    assert {r.link_id for r in out} == expect_traversed, (
        f"pipeline {sorted({r.link_id for r in out})} vs "
        f"brute {sorted(expect_traversed)} (choices {expect_links})"
    )


def test_match_trips_allocates_links(spark):
    net = _grid_network()
    out = match_trips(_pings(spark), net)
    rows = out.collect()
    matched_links = {r.link_id for r in rows}
    assert matched_links == {1, 2, 3}  # straight along road 1
    # time allocation: total allocated == total elapsed (3 × 70 s)
    total = sum(r.travel_time for r in rows)
    assert abs(total - 210.0) < 1e-6
    # aggregation A1 runs on the matched output
    agg = aggregate_link_times(out)
    got = {r.link_id: r.observations for r in agg.collect()}
    assert set(got) == {1, 2, 3}
