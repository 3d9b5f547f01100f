"""Viterbi map-matching of GPS trips to a road network (SURVEY.md
G1-G6, ``HwyNetwork.py`` + ``Trajectory.py``).

Architecture (Spark-first, per SURVEY §2.9): the road network is
city-scale (~10^4 links) so ALL network prep happens once on the
driver — link graph, all-pairs shortest-path skim (pure-Python
Dijkstra per source; scipy is not in this container), and a
grid-bucket spatial index — then broadcasts. Matching itself is
embarrassingly parallel per trip: ``groupBy(cab, trip).applyInPandas``
runs a compact Viterbi over candidate link-projections per ping and
allocates observed travel time to traversed links proportionally to
free-flow time (``HwyNetwork.py:569-610``).

Scoring reimplements ``Trajectory.py:37-86``: point score = −distance
from GPS to the candidate projection; path score = −(free-flow time +
excess-over-expected penalty), weights Θ = [1.0, 0.5]. Link-to-link
skim transitions carry turn penalties (left 30 s / right 10 s /
U-turn 60 s, ``HwyNetwork.py:126-131``), classified geometrically
from the heading change.
"""

from __future__ import annotations

import heapq
import math
import sys
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_CANDIDATE_FEET = 150.0  # HwyNetwork.py:314-367 distance limit
MAX_CANDIDATES = 5
THETA_POINT = 1.0  # Trajectory.py:97
THETA_PATH = 0.5
LEFT_TURN_PENALTY = 30.0  # seconds, HwyNetwork.py:129-131
RIGHT_TURN_PENALTY = 10.0
U_TURN_PENALTY = 60.0


@dataclass
class Link:
    link_id: int
    ax: float
    ay: float
    bx: float
    by: float
    fftt: float  # free-flow travel time, seconds

    @property
    def length(self) -> float:
        return math.hypot(self.bx - self.ax, self.by - self.ay)


@dataclass
class Network:
    """Driver-side road network: links + connectivity + spatial grid +
    link-to-link shortest free-flow times (the 'skim')."""

    links: dict[int, Link]
    cell: float = 500.0
    _grid: dict = field(default_factory=dict)
    _skim: dict = field(default_factory=dict)
    _next_hop: dict = field(default_factory=dict)

    def build(self) -> "Network":
        self._build_grid()
        self._build_skim()
        return self

    # --- G3: grid-bucket spatial index (rtree replacement) ---------
    def _cells_for(self, link: Link):
        steps = max(2, int(link.length / self.cell) + 2)
        seen = set()
        for i in range(steps + 1):
            t = i / steps
            x = link.ax + (link.bx - link.ax) * t
            y = link.ay + (link.by - link.ay) * t
            seen.add((int(x // self.cell), int(y // self.cell)))
        return seen

    def _build_grid(self):
        self._grid = {}
        for link in self.links.values():
            for c in self._cells_for(link):
                self._grid.setdefault(c, []).append(link.link_id)

    def candidates(self, x: float, y: float):
        """≤5 nearest links within 150 ft: (link_id, offset, dist)."""
        cx, cy = int(x // self.cell), int(y // self.cell)
        cand = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for lid in self._grid.get((cx + dx, cy + dy), ()):
                    link = self.links[lid]
                    off, dist = _project(x, y, link)
                    if dist <= MAX_CANDIDATE_FEET:
                        cand.append((lid, off, dist))
        cand.sort(key=lambda c: c[2])
        # one candidate per link, nearest first
        out, seen = [], set()
        for c in cand:
            if c[0] not in seen:
                out.append(c)
                seen.add(c[0])
            if len(out) >= MAX_CANDIDATES:
                break
        return out

    # --- G2: all-pairs link-to-link free-flow skim ------------------
    def _adjacency(self):
        """link → downstream links (sharing the end node)."""
        by_start: dict[tuple, list[int]] = {}
        for link in self.links.values():
            by_start.setdefault((link.ax, link.ay), []).append(link.link_id)
        adj = {}
        for link in self.links.values():
            adj[link.link_id] = by_start.get((link.bx, link.by), [])
        return adj

    def _build_skim(self):
        adj = self._adjacency()
        for src in self.links:
            dist = {src: 0.0}
            prev: dict[int, int] = {}
            pq = [(0.0, src)]
            while pq:
                d, u = heapq.heappop(pq)
                if d > dist.get(u, math.inf):
                    continue
                for v in adj[u]:
                    # movement cost = downstream link tt + turn penalty
                    # (HwyNetwork.py:255-274: link-to-link paths carry
                    # turn penalties; node paths don't)
                    nd = (
                        d
                        + self.links[v].fftt
                        + turn_penalty(self.links[u], self.links[v])
                    )
                    if nd < dist.get(v, math.inf):
                        dist[v] = nd
                        prev[v] = u
                        heapq.heappush(pq, (nd, v))
            self._skim[src] = dist
            self._next_hop[src] = prev

    def path(self, a: int, b: int) -> list[int] | None:
        """Link sequence from a to b (inclusive), or None."""
        if b not in self._skim.get(a, {}):
            return None
        seq = [b]
        prev = self._next_hop[a]
        while seq[-1] != a:
            seq.append(prev[seq[-1]])
        return list(reversed(seq))

    def fftt_between(self, a: int, b: int) -> float | None:
        return self._skim.get(a, {}).get(b)


def turn_penalty(u: Link, v: Link) -> float:
    """Turn penalty for the movement u -> v, classified geometrically
    from the heading change (the reference delegates to the dta
    Movement's isLeftTurn/isRightTurn/isUTurn; same discouragement of
    zig-zag grid paths, HwyNetwork.py:126-131): counterclockwise
    45..135 deg = left (+30 s), clockwise = right (+10 s), reversal
    beyond 135 deg = U-turn (+60 s), else straight (free)."""
    hu = math.atan2(u.by - u.ay, u.bx - u.ax)
    hv = math.atan2(v.by - v.ay, v.bx - v.ax)
    d = math.degrees(hv - hu)
    while d > 180.0:
        d -= 360.0
    while d <= -180.0:
        d += 360.0
    if abs(d) >= 135.0:
        return U_TURN_PENALTY
    if d >= 45.0:
        return LEFT_TURN_PENALTY
    if d <= -45.0:
        return RIGHT_TURN_PENALTY
    return 0.0


def _project(x: float, y: float, link: Link) -> tuple[float, float]:
    """Point → (offset along link in [0, len], distance to link)."""
    vx, vy = link.bx - link.ax, link.by - link.ay
    L2 = vx * vx + vy * vy
    if L2 == 0:
        return 0.0, math.hypot(x - link.ax, y - link.ay)
    t = max(0.0, min(1.0, ((x - link.ax) * vx + (y - link.ay) * vy) / L2))
    px, py = link.ax + t * vx, link.ay + t * vy
    return t * math.sqrt(L2), math.hypot(x - px, y - py)


MATCH_SCHEMA = StructType(
    [
        StructField("cab_id", LongType()),
        StructField("trip_id", LongType()),
        StructField("link_id", LongType()),
        StructField("start_time", StringType()),
        StructField("travel_time", DoubleType()),
        StructField("traversal_ratio", DoubleType()),
        StructField("hour", LongType()),
    ]
)


def _viterbi_match(pdf: pd.DataFrame, net: Network) -> pd.DataFrame:
    """G5: most-likely link sequence for one trip's pings, then G6:
    allocate each inter-ping Δt across the traversed links
    proportionally to free-flow time."""
    pdf = pdf.sort_values("time")
    xs, ys = pdf["x"].to_numpy(), pdf["y"].to_numpy()
    times = pd.to_datetime(pdf["time"]).to_list()

    states = [net.candidates(x, y) for x, y in zip(xs, ys)]
    # drop pings with no candidates (off-network)
    keep = [i for i, s in enumerate(states) if s]
    if len(keep) < 2:
        return pd.DataFrame({f.name: [] for f in MATCH_SCHEMA.fields})
    states = [states[i] for i in keep]
    times = [times[i] for i in keep]

    # Viterbi over candidate states
    NEG = -1e18
    score = [THETA_POINT * -d for (_, _, d) in states[0]]
    back: list[list[int]] = []
    for i in range(1, len(states)):
        dt = (times[i] - times[i - 1]).total_seconds()
        new_score, new_back = [], []
        for lid, off, dist in states[i]:
            best, best_j = NEG, -1
            for j, (plid, poff, _) in enumerate(states[i - 1]):
                fftt = (
                    0.0
                    if plid == lid
                    else net.fftt_between(plid, lid)
                )
                if fftt is None:
                    continue
                excess = max(0.0, fftt - dt)
                s = score[j] - THETA_PATH * (fftt + excess)
                if s > best:
                    best, best_j = s, j
            new_score.append(best + THETA_POINT * -dist)
            new_back.append(best_j)
        score, back = new_score, back + [new_back]

    # backtrace
    idx = max(range(len(score)), key=lambda k: score[k])
    seq = [idx]
    for bk in reversed(back):
        idx = bk[idx]
        if idx < 0:
            break
        seq.append(idx)
    seq.reverse()
    if len(seq) != len(states):
        return pd.DataFrame({f.name: [] for f in MATCH_SCHEMA.fields})

    # G6: expand matched states to link traversals + allocate time
    out = {f.name: [] for f in MATCH_SCHEMA.fields}
    cab = int(pdf["cab_id"].iloc[0])
    trip = int(pdf["trip_id"].iloc[0])
    for i in range(1, len(seq)):
        a = states[i - 1][seq[i - 1]][0]
        b = states[i][seq[i]][0]
        dt = (times[i] - times[i - 1]).total_seconds()
        links = [a] if a == b else (net.path(a, b) or [a, b])
        # merge duplicate consecutive links, weight by fftt
        ws = [max(net.links[l].fftt, 1e-9) for l in links]
        tot = sum(ws)
        for l, w in zip(links, ws):
            out["cab_id"].append(cab)
            out["trip_id"].append(trip)
            out["link_id"].append(int(l))
            out["start_time"].append(times[i - 1].isoformat())
            out["travel_time"].append(dt * w / tot)
            out["traversal_ratio"].append(1.0)
            out["hour"].append(int(times[i - 1].hour))
    return pd.DataFrame(out)


def match_trips(points: DataFrame, net: Network) -> DataFrame:
    """GPS pings (cab_id, trip_id, time, x, y) → link traversals.

    ``applyInPandas`` per (cab, trip): each group is one trajectory —
    thousands of short independent problems, the ideal grouped-map
    shape. The network rides along in the closure (broadcast by task
    serialization; city-scale ~MBs)."""
    spark = points.sparkSession
    # Executor Python workers may not have this repo on sys.path (the
    # driver can run from any cwd); serialize this module's classes by
    # VALUE so the closure is self-contained.
    try:
        import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass
    bc = spark.sparkContext.broadcast(net)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _viterbi_match(pdf, bc.value)

    return (
        points.select("cab_id", "trip_id", "time", "x", "y")
        .groupBy("cab_id", "trip_id")
        .applyInPandas(kernel, MATCH_SCHEMA)
    )
