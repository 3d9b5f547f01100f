"""Viterbi map-matching on a toy grid network (G1-G6)."""

import datetime

from pyspark.sql import Row

from sfdata_wrangler_spark.pipelines.mapmatch import Link, Network, match_trips
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
