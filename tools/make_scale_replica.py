#!/usr/bin/env python
"""Build an N-times scale replica of a testdata sf directory.

Round 10 ran its sf1.0-equivalent probes (ARCHITECTURE.md "sf1.0-equivalent
probe") against an ad-hoc /tmp replica; this commits the generator so the
probe table is reproducible in any round.

Replication semantics (match the round-10 replica exactly):

- documents: N copies, doc_id shifted by i*KEY_OFFSET, and every copy i>0
  gets a per-copy prefix token ``r<i> `` prepended to ``text`` (n_chars kept
  consistent). The perturbation keeps near-dup pair mass scaling realistic:
  identical twins would inflate LSH pair counts ~N^2, a distinct prefix
  token keeps copies similar-but-not-equal, which is what a real 10x corpus
  looks like.
- embeddings: N copies, vec_id shifted, vectors untouched (pure key shift:
  ANN cost should scale with corpus size, not with artificial new geometry).
- lineitem / orders: N copies with o_orderkey / l_orderkey shifted in
  lockstep so the order->lineitem join keeps its exact fan-out; dim FKs
  (custkey/partkey/suppkey) are NOT shifted, so dimension fan-in grows Nx,
  which is the realistic shape when facts grow and dims don't.
- events: N copies with event_id and user_id shifted, timestamps untouched
  (each copy is a disjoint user population with identical session shapes).
- dims (region nation customer supplier part): copied once, unreplicated.

Skewed variants: ``--hot-user-frac 0.4`` remaps that share of events
(deterministically, by ``event_id % 100``) onto ONE user id (the SURVEY
§4 "hot user"/bot shape that straggles per-user windows).
``--hot-cell-frac 0.4``: remaps that fraction of orders
(deterministically, by ``o_orderkey % 100``) onto ONE (order-month,
order-priority) cell — the reference's "trunk route" shape (SURVEY §4: one
trunk route carries a large share of all AVL rows) mapped onto the
flagship's expansion-weight cell. Lineitem rows follow their order through
the join, so the hot cell holds ~that fraction of the joined fact rows.

Usage: python tools/make_scale_replica.py [--src /root/testdata/sf0.1]
                                          [--dst /tmp/sfdata_sf10_flat]
                                          [--factor 10]
                                          [--hot-cell-frac 0.0]
"""
import argparse
import os

import duckdb

KEY_OFFSET = 100_000_000  # far above any key in sf<=1 testdata

DIMS = ["region", "nation", "customer", "supplier", "part"]


def _union(con, pieces, out_path, rows_per_group: int | None = None):
    """UNION ALL the pieces into one parquet file. ``rows_per_group``
    caps the parquet row-group size: a row group is Spark's atomic
    scan-split unit, and the driver's own testdata is written as ONE
    row group per file — which makes every scan (and every map stage
    pipelined into it) structurally single-task no matter the core
    count (measured r15: the 10x replica inherited the layout and the
    six heaviest queries ran 32-core:8-core at 0.8-1.2x). The replica
    targets ~64 row groups per table so a 32-way session can actually
    parallelize the scan."""
    sql = " UNION ALL ".join(pieces)
    opts = "FORMAT PARQUET"
    if rows_per_group:
        opts += f", ROW_GROUP_SIZE {rows_per_group}"
    con.execute(f"COPY ({sql}) TO '{out_path}' ({opts})")


def _rpg(con, src_path: str, factor: int, target_groups: int = 64) -> int:
    """rows-per-group so the replica lands near ``target_groups``."""
    n = con.execute(
        f"SELECT count(*) FROM '{src_path}'"
    ).fetchone()[0] * factor
    return max(1000, n // target_groups)


HOT_MONTH_DATE = "TIMESTAMP '1995-06-15 00:00:00'"
HOT_PRIORITY = "1-URGENT"
HOT_USER_ID = 777


def build(src: str, dst: str, factor: int, hot_cell_frac: float = 0.0,
          hot_user_frac: float = 0.0) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    doc = []
    for i in range(factor):
        if i == 0:
            doc.append(f"SELECT * FROM '{src}/documents.parquet'")
        else:
            pfx = f"r{i} "
            doc.append(
                f"SELECT doc_id + {i * KEY_OFFSET} AS doc_id, "
                f"'{pfx}' || text AS text, lang, source, "
                f"n_chars + {len(pfx)} AS n_chars "
                f"FROM '{src}/documents.parquet'"
            )
    _union(con, doc, f"{dst}/documents.parquet",
           _rpg(con, f"{src}/documents.parquet", factor))

    emb = [
        f"SELECT vec_id + {i * KEY_OFFSET} AS vec_id, embedding, label "
        f"FROM '{src}/embeddings.parquet'"
        for i in range(factor)
    ]
    _union(con, emb, f"{dst}/embeddings.parquet",
           _rpg(con, f"{src}/embeddings.parquet", factor))

    if hot_cell_frac > 0:
        # o_orderkey % 100 is uniform on TPC-H-ish keys; remapping the
        # first `pct` residues moves exactly that share of orders (and,
        # via the orderkey join, of lineitems) into one month×priority
        # cell. Deterministic, so reruns produce the identical lake.
        pct = int(round(hot_cell_frac * 100))
        o_date = (
            f"CASE WHEN o_orderkey % 100 < {pct} THEN {HOT_MONTH_DATE} "
            f"ELSE o_orderdate END AS o_orderdate"
        )
        o_prio = (
            f"CASE WHEN o_orderkey % 100 < {pct} THEN '{HOT_PRIORITY}' "
            f"ELSE o_orderpriority END AS o_orderpriority"
        )
    else:
        o_date, o_prio = "o_orderdate", "o_orderpriority"
    orders = [
        f"SELECT o_orderkey + {i * KEY_OFFSET} AS o_orderkey, o_custkey, "
        f"o_orderstatus, o_totalprice, {o_date}, {o_prio} "
        f"FROM '{src}/orders.parquet'"
        for i in range(factor)
    ]
    _union(con, orders, f"{dst}/orders.parquet",
           _rpg(con, f"{src}/orders.parquet", factor))

    li = [
        f"SELECT l_orderkey + {i * KEY_OFFSET} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{src}/lineitem.parquet'"
        for i in range(factor)
    ]
    _union(con, li, f"{dst}/lineitem.parquet",
           _rpg(con, f"{src}/lineitem.parquet", factor))

    if hot_user_frac > 0:
        # remap that share of events (deterministic, by event_id
        # residue) onto ONE user id — the SURVEY §4 "hot user" / bot
        # shape that straggles any per-user window
        pct = int(round(hot_user_frac * 100))
        u_expr = (
            f"CASE WHEN event_id % 100 < {pct} THEN {HOT_USER_ID} "
            f"ELSE user_id + {{off}} END AS user_id"
        )
    else:
        u_expr = "user_id + {off} AS user_id"
    ev = [
        f"SELECT event_id + {i * KEY_OFFSET} AS event_id, ts, "
        + u_expr.format(off=i * KEY_OFFSET)
        + f", event_type, value, props FROM '{src}/events.parquet'"
        for i in range(factor)
    ]
    _union(con, ev, f"{dst}/events.parquet",
           _rpg(con, f"{src}/events.parquet", factor))

    for t in DIMS + ["documents", "embeddings", "orders", "lineitem", "events"]:
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sfdata_sf10_flat")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--hot-cell-frac", type=float, default=0.0)
    ap.add_argument("--hot-user-frac", type=float, default=0.0)
    a = ap.parse_args()
    build(a.src, a.dst, a.factor, a.hot_cell_frac, a.hot_user_frac)
