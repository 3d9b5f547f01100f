"""The end-to-end restartable pipeline driver (VERDICT r9 ask #1).

The reference's actual user interface is not a query — it is
``python sfdata_wrangler.py clean1 clean2 gtfs expand aggregate
cleanClipper demand multimodal report``: a NAMED-STEP sequence where
every step reads the previous steps' persisted stores and writes its
own (``scripts/sfdata_wrangler.py:305-469``; step list :55-64). The
reference has no restart logic at all — re-running a step blindly
recomputes it. This module supplies the step DAG *with* the
operational semantics a nightly operator needs:

- every step's outputs land in a persisted parquet lake
  (``<lake_root>/tables/<table>``, overwrite mode — a half-written
  step re-runs idempotently);
- completion is recorded AFTER the outputs commit, as an atomically
  renamed per-step marker (``<lake_root>/_steps/<step>.json``) — the
  same commit-then-mark discipline as the streaming band index;
- re-invocation SKIPS a step iff its marker exists AND every output
  table still has committed data (:func:`...sources.lake.
  has_committed_data` — the r9-hardened readiness probe; a swept or
  half-deleted table re-runs even if the marker survived);
- a kill between steps (or mid-step) resumes cleanly: completed
  steps skip, the interrupted step recomputes from its persisted
  inputs, nothing upstream is touched;
- forcing a step re-runs it AND transitively invalidates every
  downstream step's marker — a stale-downstream hazard the
  skip-if-marked rule would otherwise create.

Scale notes: the runner itself moves no data — each step is a
declarative DataFrame plan whose shuffles are the step's own
(month-keyed aggregations, orderkey-colocated joins). Persisting
between steps is the reference's own materialization boundary and
buys restartability for the price of one parquet write per step —
at 100 TB one materializes exactly these boundaries anyway to bound
recompute-on-failure blast radius.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lake import atomic_write_text, hadoop_fs, has_committed_data

# --------------------------------------------------------------------------- #
# Generic machinery                                                           #
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class Step:
    """One named pipeline step.

    ``build(spark, sf_dir, read)`` returns ``{table_name: DataFrame}``;
    ``read(table)`` loads a previously persisted lake table (the ONLY
    sanctioned way to consume an upstream step's output — reading the
    upstream's source data again would silently fork lineage and
    defeat the restart contract). ``deps`` name steps, not tables,
    and must precede this step in the step list."""

    name: str
    deps: tuple[str, ...]
    outputs: tuple[str, ...]
    build: Callable[
        [SparkSession, str, Callable[[str], DataFrame]],
        Mapping[str, DataFrame],
    ] = field(compare=False)
    # non-table step outputs (VERDICT r10 ask #7 — the reference's
    # report step emits the actual .xlsx/.svg deliverables,
    # scripts/sfdata_wrangler.py:439-467, not just a store):
    # ``artifacts(spark, read, artifacts_dir)`` runs AFTER the step's
    # tables commit (so artifacts derive from exactly what readers
    # see) and must write precisely ``artifact_files`` under
    # ``artifacts_dir``. Completion requires the files to exist, the
    # same committed-data honesty rule as tables.
    artifact_files: tuple[str, ...] = ()
    artifacts: Callable | None = field(default=None, compare=False)


def table_path(lake_root: str, table: str) -> str:
    return f"{lake_root.rstrip('/')}/tables/{table}"


def artifacts_path(lake_root: str) -> str:
    """Directory for non-table step deliverables (.xlsx/.svg). Local
    filesystem only — the artifact sinks write through plain
    ``open()``, matching the reference's report step."""
    return f"{lake_root.rstrip('/')}/_artifacts"


def _marker_path(lake_root: str, step: str) -> str:
    return f"{lake_root.rstrip('/')}/_steps/{step}.json"


def _write_marker(spark, lake_root: str, step: str, payload: dict) -> None:
    """Atomic commit of a step's completion marker
    (:func:`...sources.lake.atomic_write_text` — temp name + checked
    rename, the shared control-file commit primitive)."""
    atomic_write_text(
        spark,
        _marker_path(lake_root, step),
        json.dumps(payload, sort_keys=True),
    )


def _marker_exists(spark, lake_root: str, step: str) -> bool:
    fs, _p, jvm = hadoop_fs(spark, lake_root)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(_marker_path(lake_root, step))
    )


def _delete_marker(spark, lake_root: str, step: str) -> None:
    fs, _p, jvm = hadoop_fs(spark, lake_root)
    fs.delete(jvm.org.apache.hadoop.fs.Path(_marker_path(lake_root, step)), False)


def step_completed(spark, lake_root: str, step: Step) -> bool:
    """Marker exists AND every output table still holds committed
    data files. The second half matters: markers outlive swept or
    half-deleted tables, and trusting them alone would skip a step
    whose outputs are gone (the 'idle-not-die' guard class from r9:
    completion means committed DATA, never metadata existence)."""
    if not _marker_exists(spark, lake_root, step.name):
        return False
    if not all(
        has_committed_data(spark, table_path(lake_root, t))
        for t in step.outputs
    ):
        return False
    # artifacts are outputs too: a swept .xlsx/.svg re-runs the step
    # even under a surviving marker (same rule as tables)
    import os

    return all(
        os.path.exists(os.path.join(artifacts_path(lake_root), f))
        for f in step.artifact_files
    )


def _downstream_closure(steps: Sequence[Step], roots: set[str]) -> set[str]:
    """Roots plus every step that transitively depends on one."""
    out = set(roots)
    changed = True
    while changed:
        changed = False
        for s in steps:
            if s.name not in out and any(d in out for d in s.deps):
                out.add(s.name)
                changed = True
    return out


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    lake_root: str,
    steps: Sequence[Step] | None = None,
    force: Sequence[str] = (),
    parallelism: int = 1,
) -> list[dict]:
    """Execute the step DAG against the persisted lake at
    ``lake_root``, skipping committed steps; returns one summary dict
    per step (``{"step", "status": "ran"|"skipped", "rows": {...}}``),
    always in step-list order.

    ``force`` re-runs the named steps and transitively invalidates
    their downstreams (their markers are deleted up front, so even a
    crash right after the delete leaves the lake in the honest
    "incomplete, will re-run" state, never "stale but marked done").

    ``parallelism`` > 1 runs INDEPENDENT branches concurrently (a
    step launches once its in-list deps completed) — the wall-clock
    shape a real orchestrator gives this DAG, where the AVL chain,
    the Clipper panel, and the demand/multimodal branches share no
    edges. Semantics are unchanged: same markers, same skip rule,
    same crash behavior per step."""
    explicit_subset = steps is not None
    steps = list(transit_steps() if steps is None else steps)
    by_name = {s.name: s for s in steps}
    seen: set[str] = set()
    claimed_outputs: dict[str, str] = {}
    for s in steps:
        # in an EXPLICIT subset a dep absent from the list is allowed
        # — the reference UX runs single later steps against
        # previously persisted stores, and read()'s committed-data
        # guard fails loudly if the lake doesn't actually hold the
        # dep's outputs. The full canonical DAG keeps strict unknown-
        # dep validation (code-review r10 pass-2 #1: a typo'd dep
        # name would otherwise silently break transitive
        # force-invalidation and serve stale downstream output marked
        # done). Deps that ARE in the list must precede consumers.
        if s.name in seen:
            # a duplicate is harmless sequentially (the second copy
            # skips) but under parallelism both copies would race
            # overwrite-writes to the same table paths (code-review
            # r10 pass-5 #2) — reject uniformly
            raise ValueError(f"duplicate step name {s.name!r}")
        unknown = [d for d in s.deps if d not in by_name]
        if unknown and not explicit_subset:
            raise ValueError(
                f"step {s.name!r} depends on unknown {unknown}"
            )
        if any(d in by_name and d not in seen for d in s.deps):
            raise ValueError(
                f"step {s.name!r} listed before its dependencies"
            )
        for t in s.outputs:
            # two steps claiming one table would race overwrite-
            # writes to the same path under parallelism>1 and
            # silently clobber each other sequentially (ADVICE r10
            # #4) — reject in the same validation pass
            if t in claimed_outputs:
                raise ValueError(
                    f"output table {t!r} claimed by both "
                    f"{claimed_outputs[t]!r} and {s.name!r}"
                )
            claimed_outputs[t] = s.name
        # a declared artifact with no builder can never satisfy
        # step_completed, so the step would silently re-run (and
        # overwrite its committed tables) on EVERY invocation forever
        # (code-review r11 #10); the inverse mismatch is caught at
        # execute time by the made != declared check
        if s.artifact_files and s.artifacts is None:
            raise ValueError(
                f"step {s.name!r} declares artifact_files "
                f"{s.artifact_files} but no artifacts builder"
            )
        if s.artifact_files and "://" in lake_root:
            # artifact builders write through plain open()/os.path —
            # on a URI lake_root those calls would treat the URI as a
            # RELATIVE local path and scatter cwd-dependent junk while
            # step_completed never stabilizes (code-review r11 #11);
            # refuse up front rather than half-work
            raise ValueError(
                f"step {s.name!r} declares artifacts, which require a "
                f"local-filesystem lake_root (got {lake_root!r})"
            )
        seen.add(s.name)
    if set(force) - set(by_name):
        raise ValueError(f"unknown force steps: {sorted(set(force) - set(by_name))}")
    # Force-invalidation must cover the CANONICAL DAG's downstream
    # closure, not just the steps passed this call (ADVICE r10 #1):
    # with an explicit subset (e.g. CLI `runner gtfs --force gtfs`)
    # the canonical downstreams (expand/aggregate/report) are outside
    # the list, and leaving their markers intact lets a later full
    # run skip them and serve stale output marked done — the exact
    # hazard force-invalidation exists to prevent. Deleting a marker
    # for a step not being run is always safe (it re-runs next time);
    # custom test DAGs whose names don't appear in the canonical DAG
    # gain nothing and lose nothing from the union.
    invalid = _downstream_closure(steps, set(force))
    if force and explicit_subset:
        canon = list(transit_steps())
        invalid |= _downstream_closure(
            canon, set(force) & {s.name for s in canon}
        )
    for name in invalid:
        _delete_marker(spark, lake_root, name)

    def read(table: str) -> DataFrame:
        path = table_path(lake_root, table)
        if not has_committed_data(spark, path):
            raise FileNotFoundError(
                f"lake table {table!r} has no committed data at {path} — "
                "its producing step has not completed"
            )
        return spark.read.parquet(path)

    def _execute(s: Step) -> dict:
        if step_completed(spark, lake_root, s):
            return {"step": s.name, "status": "skipped", "rows": {}}
        # monotonic: a wall-clock step-back mid-step must not persist
        # a negative duration into the marker (code-review r10 pass-5)
        t0 = time.monotonic()
        outs = dict(s.build(spark, sf_dir, read))
        if set(outs) != set(s.outputs):
            raise ValueError(
                f"step {s.name!r} declared outputs {s.outputs} but built "
                f"{sorted(outs)}"
            )
        rows = {}
        for t, df in outs.items():
            df.write.mode("overwrite").parquet(table_path(lake_root, t))
            # row counts come from the COMMITTED files, making the
            # marker a faithful receipt of what readers will see
            rows[t] = spark.read.parquet(table_path(lake_root, t)).count()
        if s.artifacts is not None:
            import os

            adir = artifacts_path(lake_root)
            os.makedirs(adir, exist_ok=True)
            made = set(s.artifacts(spark, read, adir))
            if made != set(s.artifact_files):
                raise ValueError(
                    f"step {s.name!r} declared artifacts "
                    f"{s.artifact_files} but wrote {sorted(made)}"
                )
        wall_s = round(time.monotonic() - t0, 2)
        _write_marker(
            spark, lake_root, s.name,
            {"step": s.name, "sf_dir": sf_dir, "rows": rows,
             "artifacts": sorted(s.artifact_files),
             "wall_s": wall_s},
        )
        return {
            "step": s.name, "status": "ran", "rows": rows,
            "wall_s": wall_s,
        }

    if parallelism <= 1:
        return [_execute(s) for s in steps]

    # dependency-driven concurrent execution: a step launches as soon
    # as its in-list deps completed (Spark job submission is
    # thread-safe; each step writes disjoint paths and commits its own
    # marker, so the restart contract is unchanged — a crash leaves
    # completed branches committed and everything else honest-
    # incomplete). On a step failure, QUEUED futures are cancelled
    # (submitted-but-unstarted steps past max_workers would otherwise
    # still launch during the shutdown drain — code-review r10 pass-5
    # #4); already-RUNNING branches drain to completion before the
    # error propagates, so their markers stay faithful.
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    results: dict[str, dict] = {}
    completed: set[str] = set()
    pending = list(steps)
    in_flight: dict = {}
    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        try:
            while pending or in_flight:
                ready = [
                    s
                    for s in pending
                    if all(
                        d in completed for d in s.deps if d in by_name
                    )
                ]
                for s in ready:
                    pending.remove(s)
                    in_flight[pool.submit(_execute, s)] = s
                finished, _ = wait(in_flight, return_when=FIRST_COMPLETED)
                for fut in finished:
                    s = in_flight.pop(fut)
                    results[s.name] = fut.result()  # re-raises errors
                    completed.add(s.name)
        except BaseException:
            pool.shutdown(wait=True, cancel_futures=True)
            raise
    return [results[s.name] for s in steps]


# --------------------------------------------------------------------------- #
# The transit step DAG (reference step list, mapped onto the test star        #
# schema: lineitem = AVL/APC observations, orders = GTFS schedule,            #
# events = Clipper tags, customer/nation/region = demand crosswalk).          #
# Money stays in integer ten-thousandths (the repo's _msum2 device) so        #
# every persisted intermediate and the final report are exact.               #
# --------------------------------------------------------------------------- #

_MONTH = "yyyy-MM-dd"


def _tt(col):
    """Integer ten-thousandths of a ≤4-decimal money expression —
    exact in Spark, DuckDB, and parquet alike."""
    return F.floor(col * 10000 + 0.5).cast("long")


def _dollars(tt_col):
    """tt → dollars rounded to cents, the _msum2 floor form."""
    return F.floor((tt_col + 50) / 100.0) / 100.0


def _clean1(spark, sf_dir, read):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    avl = li.where(
        (F.col("l_quantity") > 0)
        & F.col("l_orderkey").isNotNull()
        & F.col("l_partkey").isNotNull()
    ).select(
        "l_orderkey",
        "l_partkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("route"),
        _tt(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "fare_tt"
        ),
        F.floor(F.col("l_quantity") * 100 + 0.5).cast("long").alias("qty_c"),
    )
    return {"avl_clean": avl}


def _clean2(spark, sf_dir, read):
    from ..operators.windows import dedup_by_order

    # (l_orderkey, l_partkey, l_linenumber) is NOT unique in the test
    # generator (and real AVL feeds have exact-duplicate pings too) —
    # the remaining value columns complete the total order so the
    # surviving row is engine-independent (the P5 rule: every dedup
    # carries a unique tie-break)
    return {
        "avl_dedup": dedup_by_order(
            read("avl_clean"),
            ["l_orderkey", "l_partkey"],
            ["l_linenumber", "fare_tt", "qty_c", "route"],
        )
    }


def _gtfs(spark, sf_dir, read):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sched = orders.select(
        "o_orderkey",
        "o_custkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), _MONTH).alias(
            "month"
        ),
        _tt(F.col("o_totalprice")).alias("price_tt"),
    )
    monthly = sched.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_sched"),
        F.sum("price_tt").cast("long").alias("sched_rev_tt"),
    )
    return {"sched_orders": sched, "sched_monthly": monthly}


def _expand(spark, sf_dir, read):
    obs = (
        read("avl_dedup")
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("obs_lines"),
            F.sum("fare_tt").cast("long").alias("obs_fare_tt"),
            F.sum("qty_c").cast("long").alias("obs_qty_c"),
        )
    )
    expanded = (
        read("sched_orders")
        .join(obs, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .select(
            "o_orderkey",
            "month",
            "price_tt",
            F.coalesce("obs_lines", F.lit(0)).cast("long").alias("obs_lines"),
            F.coalesce("obs_fare_tt", F.lit(0)).cast("long").alias(
                "obs_fare_tt"
            ),
            F.coalesce("obs_qty_c", F.lit(0)).cast("long").alias("obs_qty_c"),
            F.col("l_orderkey").isNotNull().cast("int").alias("observed"),
        )
    )
    return {"expanded": expanded}


def _aggregate(spark, sf_dir, read):
    monthly = (
        read("expanded")
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("observed").cast("long").alias("obs_orders"),
            F.sum("obs_lines").cast("long").alias("obs_lines"),
            F.sum("obs_fare_tt").cast("long").alias("fare_tt"),
            F.sum("obs_qty_c").cast("long").alias("qty_c"),
        )
    )
    return {"monthly_ts": monthly}


def _clipper(spark, sf_dir, read):
    from pyspark.sql import Window

    from ..plans.catalog import _events

    ev = _events(spark, sf_dir).select(
        "event_id", "user_id", "ts",
        F.date_format(F.date_trunc("month", "ts"), _MONTH).alias("month"),
    )
    lag_us = F.lag(F.unix_micros("ts")).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    starts = ev.withColumn(
        "is_start",
        (lag_us.isNull() | ((F.unix_micros("ts") - lag_us) > 30 * 60 * 1_000_000))
        .cast("long"),
    )
    monthly = starts.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("is_start").cast("long").alias("n_sessions"),
    )
    return {"clipper_monthly": monthly}


def _taxi(spark, sf_dir, read):
    from pyspark.sql import Window

    rm = (
        read("avl_dedup")
        .join(
            read("sched_orders").select("o_orderkey", "month"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("month", "route")
        .agg(F.sum("fare_tt").cast("long").alias("route_fare_tt"))
    )
    w = Window.partitionBy("month").orderBy(
        F.col("route_fare_tt").desc(), F.col("route")
    )
    top = (
        rm.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "month",
            F.col("route").alias("top_route"),
            F.col("route_fare_tt").alias("top_route_fare_tt"),
        )
    )
    return {"route_top_monthly": top}


def _demand(spark, sf_dir, read):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    xwalk = F.broadcast(
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey", "r_name")
    )
    demand = (
        read("sched_orders")
        .join(xwalk, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("month")
        .agg(
            F.countDistinct("o_custkey").alias("active_custs"),
            F.sum(
                F.when(F.col("r_name") == "AMERICA", F.col("price_tt"))
                .otherwise(F.lit(0))
            ).cast("long").alias("amer_rev_tt"),
        )
    )
    return {"demand_monthly": demand}


def _multimodal(spark, sf_dir, read):
    sched = read("sched_orders")
    annual = sched.groupBy(
        F.substring("month", 1, 4).alias("year")
    ).agg(
        F.expr("sum(price_tt) div count(1)").cast("long").alias(
            "annual_price_q"
        )
    )
    months = read("sched_monthly").select("month").distinct()
    mm = months.join(
        F.broadcast(annual),
        F.substring("month", 1, 4) == F.col("year"),
    ).select("month", "annual_price_q")
    return {"mm_monthly": mm}


def _report(spark, sf_dir, read):
    # FULL outer on month between the transit and Clipper panels: the
    # test calendar's event months do not intersect the order months,
    # and a left join would silently drop every Clipper row — leaving
    # the sessionization step's VALUES outside the end-to-end hash
    # (a wrong n_sessions would go unnoticed). Clipper-only months
    # surface with the transit metrics zeroed, the reference's
    # "report what each store has" shape.
    rep = (
        read("monthly_ts")
        .join(read("clipper_monthly"), "month", "full")
        .join(read("demand_monthly"), "month", "left")
        .join(F.broadcast(read("mm_monthly")), "month", "left")
        .join(F.broadcast(read("route_top_monthly")), "month", "left")
        .select(
            "month",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("obs_orders", F.lit(0)).cast("long").alias(
                "obs_orders"
            ),
            F.coalesce("obs_lines", F.lit(0)).cast("long").alias(
                "obs_lines"
            ),
            _dollars(F.coalesce("fare_tt", F.lit(0))).alias("fare"),
            F.coalesce("qty_c", F.lit(0)).cast("long").alias("qty_c"),
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
            F.coalesce("n_sessions", F.lit(0)).cast("long").alias(
                "n_sessions"
            ),
            F.coalesce("active_custs", F.lit(0)).cast("long").alias(
                "active_custs"
            ),
            _dollars(F.coalesce("amer_rev_tt", F.lit(0))).alias("amer_rev"),
            F.coalesce("annual_price_q", F.lit(0)).cast("long").alias(
                "price_q"
            ),
            F.coalesce("top_route", F.lit("NONE")).alias("top_route"),
        )
    )
    return {"report_system": rep}


REPORT_XLSX = "system_report.xlsx"
REPORT_SVG = "fare_momentum.svg"


def _report_artifacts(spark, read, adir: str) -> list[str]:
    """The report step's actual deliverables, mirroring the
    reference's report stage (``scripts/sfdata_wrangler.py:439-467``
    writes the performance workbook; the viz module renders the
    ramp-colored plots):

    - ``system_report.xlsx`` — the S10 sink over the committed
      ``report_system`` panel (Values sheet + month-over-month
      difference FORMULAS + inline sparklines), with the panel's
      metrics mapped onto the report sections (line items play
      "Line Items", fare plays "Revenue", Clipper quantity plays
      "Quantity").
    - ``fare_momentum.svg`` — the S11 sink: one segment per
      month-over-month transition, colored by the fare ratio through
      the SAME ``tt_ratio_color`` ramp the reference's
      ``getLinkTTRatioColor`` uses (no prior month / no change ⇒
      ratio exactly 1.0 ⇒ the ramp's 'no observation' gray).

    Both read the COMMITTED report_system table (not the in-flight
    DataFrame), so a restart that skips the report step could
    regenerate byte-identical artifacts from the lake alone."""
    import os

    from ..sources.report_xlsx import write_system_report
    from ..sources.viz_svg import render_multiline_svg, tt_ratio_color

    rep = read("report_system")
    panel = rep.select(
        "month",
        F.col("active_custs").alias("n_customers"),
        "n_orders",
        F.col("obs_lines").alias("n_items"),
        F.col("fare").alias("revenue"),
        F.col("qty_c").alias("quantity"),
    )
    write_system_report(panel, os.path.join(adir, REPORT_XLSX))

    from pyspark.sql import Window

    w = Window.orderBy("month")  # months-per-panel rows: single task
    seg = (
        rep.select("month", "fare")
        .withColumn("prev", F.lag("fare").over(w))
        .withColumn("x", F.row_number().over(w))
        .withColumn(
            "ratio",
            F.when(
                F.col("prev") > 0, F.col("fare") / F.col("prev")
            ).otherwise(F.lit(1.0)),
        )
    )
    styled = (
        seg.where(F.col("prev").isNotNull())
        .select("x", "prev", "fare", tt_ratio_color(F.col("ratio")).alias("color"))
        .orderBy("x")
        .collect()
    )
    lines = [
        {
            "xs": [r["x"] - 1, r["x"]],
            "ys": [r["prev"], r["fare"]],
            "color": r["color"],
            "width": 3,
        }
        for r in styled
    ]
    with open(os.path.join(adir, REPORT_SVG), "w") as fh:
        fh.write(
            render_multiline_svg(lines, title="Monthly fare momentum")
        )
    return [REPORT_XLSX, REPORT_SVG]


def transit_steps() -> list[Step]:
    """The reference's named-step sequence
    (``scripts/sfdata_wrangler.py:55-64``) as a dependency-explicit
    DAG over the test star schema."""
    return [
        Step("clean1", (), ("avl_clean",), _clean1),
        Step("clean2", ("clean1",), ("avl_dedup",), _clean2),
        Step("gtfs", (), ("sched_orders", "sched_monthly"), _gtfs),
        Step("expand", ("clean2", "gtfs"), ("expanded",), _expand),
        Step("aggregate", ("expand",), ("monthly_ts",), _aggregate),
        Step("cleanClipper", (), ("clipper_monthly",), _clipper),
        Step("taxi", ("clean2", "gtfs"), ("route_top_monthly",), _taxi),
        Step("demand", ("gtfs",), ("demand_monthly",), _demand),
        Step("multimodal", ("gtfs",), ("mm_monthly",), _multimodal),
        Step(
            "report",
            ("aggregate", "cleanClipper", "taxi", "demand", "multimodal"),
            ("report_system",),
            _report,
            artifact_files=(REPORT_XLSX, REPORT_SVG),
            artifacts=_report_artifacts,
        ),
    ]


def _main(argv: list[str]) -> int:
    """CLI parity with the reference's invocation style
    (``python sfdata_wrangler.py clean1 clean2 gtfs ...``)::

        python -m sfdata_wrangler_spark.pipelines.runner \\
            --sf-dir /root/testdata/sf0.01 --lake /tmp/lake \\
            [--force stepA,stepB] [step ...]

    Steps given positionally restrict the DAG to those steps; they
    execute in CANONICAL DAG order regardless of the order typed, and
    duplicates collapse (the set filter below). Deps outside the
    subset are satisfied from the lake's persisted tables — missing
    ones fail loudly at read time. No positional steps = run the full
    DAG. Exit code 0 on success."""
    import argparse

    p = argparse.ArgumentParser(prog="sfdata_wrangler_spark.runner")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--lake", required=True)
    p.add_argument("--force", default="")
    p.add_argument("--parallelism", type=int, default=1)
    p.add_argument("steps", nargs="*")
    args = p.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("pipeline-runner")
    spark.sparkContext.setLogLevel("WARN")
    steps = transit_steps()
    if args.steps:
        wanted = set(args.steps)
        unknown = wanted - {s.name for s in steps}
        if unknown:
            p.error(f"unknown steps: {sorted(unknown)}")
        steps = [s for s in steps if s.name in wanted]
    force = tuple(x for x in args.force.split(",") if x)
    for row in run_pipeline(
        spark, args.sf_dir, args.lake, steps, force,
        parallelism=args.parallelism,
    ):
        print(f"{row['step']:<14} {row['status']:<8} {row['rows']}")
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
