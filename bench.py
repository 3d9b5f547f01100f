"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed multiple times; the best run is reported.

Two timed actions per query:

- ``count()`` — the BENCH_r01/r02 methodology. This is the primary
  ``value``/``queries`` so totals stay comparable across rounds, and
  it doubles as the rows vacuity guard.
- a ``noop``-sink write (``queries_noop_sink``) — stricter: under
  count() Catalyst prunes unused aggregate expressions and eliminates
  provably-unique left joins, so count-based timings can skip part of
  the declared work (measured: j1_observed_left_join 0.34s by count
  vs 0.64s noop — the runtime/observed computations were optimized
  away). The noop sink forces every output column while writing
  nothing; it is the honest full-plan cost.

The headline set grew 11 -> 17 queries in round 3 (repetition stats,
SemDedup, curation v2, and three reference-domain pipeline workloads
per VERDICT r2 item 5) and further in the round-3 restart (two-stage
rerank, the QC-panel workload), so ``value`` is not directly
comparable to BENCH_r02's 6.489s; ``value_comparable_r2`` is the
same-methodology subtotal over exactly the round-2 query set —
compare THAT across rounds.

Round-15 additions (VERDICT r14 asks #1/#2/#9 — all additive, the
count() methodology and every existing key are unchanged):

- per-query noop-sink timings are PROMOTED into the compact line as
  ``noop_vals`` — a list of seconds aligned with the ``queries``
  dict's key order (2 decimals; the full named dict stays in
  BENCH_FULL_latest.json as ``queries_noop_sink``). Rationale: the
  count() action prunes aggregate/projection work, so count-based
  per-query numbers both hid real full-plan costs (emb_semdedup 0.30
  count vs 1.92 noop) and charged txt_lm_score's persist fill as a
  0.82x regression for a change that makes the full plan 35% cheaper.
- an **sf1-class scale point** (``value_sf1``/``queries_sf1``): the
  six heaviest headline queries re-timed against a deterministic
  ``SPARK_GRAFT_SF1_FACTOR``x (default 10x) replica of the sf dir
  built by tools/make_scale_replica.py into a throwaway tempdir. At
  sf0.1 (~600k rows) task-scheduling overhead dominates and NO query
  ran faster on 32 cores than on 8 (PERF_r14 scaling: every ratio
  ≤1.17) — the sf1 point gives the driver's low-core rerun a scale
  where parallelism pays, so 8v32 ratios become meaningful. The
  replica is INPUT derivation (the timed queries still compute from
  parquet), built once per invocation and deleted at exit.
- a **low-core cross-check stamp** (``c8_comparable_r2`` /
  ``suspect_freq_drift``): a fresh local[8] subprocess
  (tools/lowcore_probe.py) re-times the comparable-r2 set; if 8 cores
  beat the 32-core reading by >15% the run is flagged — the r14
  frequency-drift regime's signature (the same tree read 25.98 s at 8
  cores vs 31.78 s at 32) that the cpu/load/io/mc probes all miss.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The 11 headline queries benched in rounds 1-2 (BENCH_r02.json):
# value_comparable_r2 sums these under the same count() methodology.
R2_HEADLINE = [
    "flagship_expand_weight_cascade",
    "a0_pricing_summary",
    "j1_observed_left_join",
    "j2_interval_join",
    "w4_sessionize",
    "emb_lsh_topk",
    "dd_minhash_lsh_pairs_fast",
    "q5_local_supplier_volume",
    "txt_stats",
    "dd_exact_groups",
    "emb_cosine_topk",
]

# The six heaviest headline queries (VERDICT r14 ask #2) re-timed at
# the sf1-class scale point — the set where 8v32 scaling ratios can
# demonstrate the §2 parallelism properties sf0.1 cannot.
SF1_QUERIES = [
    "pipe_curation_v3",
    "emb_ivfpq_topk",
    "pipe_curation_v2",
    "dd_dup_spans",
    "pipe_curation_v4",
    "dd_minhash_lsh_pairs_fast",
]

# process-lifetime replica dir (built once, shared by both requeue
# attempts, removed at exit)
_SF1_CACHE: dict[str, str] = {}


def _sf1_dir(sf_dir: str, factor: int) -> str | None:
    """Build (once per process) the ``factor``x deterministic scale
    replica of ``sf_dir`` via tools/make_scale_replica.py and return
    its path; None when the generator is unavailable. The replica is
    derived input data — every timed query still computes from
    parquet — and lives in a tempdir removed at process exit."""
    key = f"{sf_dir}|{factor}"
    if key in _SF1_CACHE:
        return _SF1_CACHE[key]
    import atexit
    import contextlib
    import shutil
    import tempfile

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    )
    try:
        from make_scale_replica import build as _build_replica
    except Exception as exc:  # duckdb missing etc. — skip, don't kill
        print(f"# sf1 replica unavailable: {exc}", file=sys.stderr)
        return None
    root = tempfile.mkdtemp(prefix="bench_sf1_replica_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    t0 = time.perf_counter()
    # build() prints row counts; stdout must stay JSON-only
    with contextlib.redirect_stdout(sys.stderr):
        _build_replica(sf_dir, root, factor)
    print(
        f"# sf1 replica ({factor}x) built in "
        f"{time.perf_counter() - t0:.1f}s at {root}",
        file=sys.stderr,
    )
    _SF1_CACHE[key] = root
    return root


def _lowcore_probe(sf_dir: str, cpus: int = 8) -> dict | None:
    """Run tools/lowcore_probe.py in a fresh subprocess (own JVM on
    local[cpus]) and return its parsed JSON, or None on any failure —
    an unmeasured probe must not kill the bench."""
    import subprocess

    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "lowcore_probe.py",
    )
    try:
        proc = subprocess.run(
            [sys.executable, script, sf_dir, str(cpus)],
            capture_output=True,
            text=True,
            timeout=600,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    except Exception as exc:
        print(f"# lowcore probe failed: {exc}", file=sys.stderr)
    return None


def _io_probe(sf_dir: str, cap_bytes: int = 100 << 20) -> dict | None:
    """Page-cache probe (VERDICT r11 ask #4): sequentially re-read the
    bench's own input parquet (files > 256 KB, up to ``cap_bytes``)
    with plain buffered reads and report the throughput. Calibrated on
    this box: page-cache-warm reads measure 1.7-4.3 GB/s, reads after
    an fadvise-DONTNEED eviction measure ~150 MB/s — so a probe under
    ``IO_COLD_MBPS`` (600, the log-midpoint) means the input pages
    were evicted (e.g. by a 17-minute pytest suite right before) and
    the run's timings include re-faulting them from disk: the r11
    blind spot where serve_warm read 2.15 s with a CLEAN cpu/load
    stamp. The probe itself re-warms what it reads, which is fine —
    it measures the state the suite STARTS from."""
    # regular FILES only (a Spark-written lake's *.parquet entries are
    # DIRECTORIES — open() would raise IsADirectoryError), and nothing
    # qualifying returns None rather than a 0-byte "0.0 MB/s" reading
    # that would stamp every run io_cold forever (code-review r12 #2)
    files = sorted(
        (
            p
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
            and os.path.isfile(p := os.path.join(sf_dir, f))
            and os.path.getsize(p) > 256 * 1024
        ),
        key=os.path.getsize,
        reverse=True,
    )
    total = 0
    t0 = time.perf_counter()
    for p in files:
        with open(p, "rb", buffering=0) as fh:
            while total < cap_bytes:
                b = fh.read(1 << 20)
                if not b:
                    break
                total += len(b)
        if total >= cap_bytes:
            break
    dt = time.perf_counter() - t0
    if total == 0:
        return None
    # dt can quantize to ~0 on a tiny fully-cached read; clamp to a
    # large FINITE value (json would serialize float('inf') as the
    # invalid literal Infinity in the compact line)
    mbps = (total / 1e6) / dt if dt > 0 else 1e6
    return {
        "io_probe_mb": round(total / 1e6, 1),
        "io_probe_sec": round(dt, 4),
        "io_mbps": round(mbps, 1),
    }


# below this read throughput the bench inputs were NOT in page cache
# at start (measured: warm 1700+ MB/s, evicted ~150 MB/s)
IO_COLD_MBPS = 600.0

# eight CONCURRENT PROCESSES of the probe workload should each run in
# ~1x its solo time on a healthy 32-core box (measured 1.3 on this box
# idle); a box delivering fewer effective cores than advertised
# (hypervisor steal / core capping) timeslices them to ratios of 4+.
# Motivating episode (r12): three consecutive "clean" benches read
# 6.35/9.01/8.21 s comparable_r2 vs the same day's 5.66 s — every
# MULTI-threaded query uniformly inflated while load1 and the
# single-thread probe read clean, the one regime those two cannot see.
# The probe must be PROCESS-based: numpy's elementwise ufunc loops
# hold the GIL, so a thread-based version measures GIL serialization
# (~3-4x on a healthy idle box — code-review r12 pass-2, refuted
# empirically) instead of core availability.
MC_RATIO_CONTENDED = 2.5

# per-core SPEED drift gate: the committed clean-state cluster of
# cpu_probe_sec across rounds 9-12 is 0.024-0.037 s; during the r12
# frequency-capped episode the same probe read 0.042-0.047 s (~1.5x)
# while load1, the 0.1 s starvation threshold, the io probe AND the
# multi-core ratio (1.05 — cores available, just slower) all read
# clean, and comparable_r2 inflated 5.66 -> 8.08 s in proportion.
# 0.040 splits the two observed clusters; a run above it is timed on
# a slower per-core machine and is not comparable round-over-round.
CPU_SLOW_SEC = 0.040


def _mc_work(_=None) -> float:
    """One cache-resident numpy workload (1.6 MB array — measures
    cores, not memory bandwidth), timed INSIDE the worker so pool
    dispatch overhead never pollutes the ratio. Module-level: process
    pools need a picklable callable."""
    import numpy as np

    a = np.arange(200_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(100):
        float((a * a).sum())
    return time.perf_counter() - t0


def _mc_probe_ratio() -> float:
    """Multi-core capacity probe: the slowest of EIGHT concurrent
    PROCESS copies of :func:`_mc_work`, divided by one copy's solo
    time in the same pool. ~1.0-1.5 = the advertised cores are really
    available; >>2 = they are not, and multi-threaded query timings
    are inflated even though the single-thread cpu probe reads
    clean."""
    import concurrent.futures as cf

    try:
        with cf.ProcessPoolExecutor(max_workers=8) as pool:
            list(pool.map(_mc_work, range(8)))  # warm: fork + imports
            solo = min(pool.map(_mc_work, [None] * 3))
            # MEDIAN worker over fastest solo, best of two rounds:
            # core capping timeslices ALL eight workers (median reads
            # 4+), while a transient scheduler blip hits one worker —
            # max(per) spiked a healthy idle box to 2.0 against a
            # 1.1-1.4 steady state, too close to the 2.5 threshold
            ratios = []
            for _ in range(2):
                per = sorted(pool.map(_mc_work, range(8)))
                ratios.append(per[len(per) // 2] / solo)
        return round(min(ratios), 2) if solo > 0 else 1.0
    except Exception:
        # a sandbox that forbids fork must not kill the bench — an
        # unmeasured ratio reads as healthy (the other probes still
        # stamp), mirroring the io probe's None contract
        return 1.0


def _run_context(io_probe_dir: str | None = None) -> dict:
    """Stamp the conditions this bench ran under (VERDICT r7 #2/#4:
    BENCH_r07 recorded a phantom +35% regression because a
    BACKGROUNDED bench runs ~2x slower uniformly — the committed
    artifact needs enough context that a judge can classify an
    inflated number as environmental without re-measuring).

    - ``load1_*``: 1-min load average around the run. A loaded host
      (load1 >> a few) means timings are contention-inflated.
    - ``cpu_probe_sec``: a fixed single-thread numpy workload timed
      directly — the unambiguous starvation detector. On this box a
      clean run measures ~0.05-0.06s; a CPU-starved (backgrounded /
      contended) process measures proportionally slower, so a probe
      at 2x the clean value means the query timings are inflated by
      about the same factor.
    - ``stdin_tty``/``stdout_tty``: interactive vs piped invocation
      (the driver pipes; so do foreground harness runs — the probe is
      the discriminator, the tty bits are context).
    - ``io_*`` (only when ``io_probe_dir`` is given — the BEFORE
      context): page-cache probe over the bench inputs, closing the
      r11 blind spot where a run right after the pytest suite read
      serve_warm at 2.15 s with a clean CPU/load stamp (VERDICT r11
      ask #4)."""
    import numpy as np

    # load1 sampled FIRST (ADVICE r12 #4): the 8-process multi-core
    # probe's own CPU burst otherwise inflates the before-side load1
    # stamp ~+0.2-0.3 toward the 1.0 contended gate — conservative
    # (false-contended only) but it skewed cross-round comparisons
    load1 = round(os.getloadavg()[0], 2)
    a = np.arange(2_000_000, dtype=np.float64)
    # one untimed pass first: the process's FIRST numpy workload pays
    # allocator/page-fault warm-up (~0.10s measured vs ~0.04s steady on
    # an idle host), which put the cold ctx_before probe over the 0.1s
    # contention threshold even at load1 0.2 — stamping every run
    # contended and making the stamp useless
    float((a * a).sum())
    t0 = time.perf_counter()
    for _ in range(10):
        float((a * a).sum())
    single = time.perf_counter() - t0
    ctx = {
        "cpu_probe_sec": round(single, 4),
        "mc_probe_ratio": _mc_probe_ratio(),
        "load1": load1,
        "cpus": os.cpu_count(),
        "stdin_tty": sys.stdin.isatty(),
        "stdout_tty": sys.stdout.isatty(),
    }
    if io_probe_dir is not None and os.path.isdir(io_probe_dir):
        io = _io_probe(io_probe_dir)
        if io is not None:  # None = nothing measurable, no stamp
            ctx.update(io)
            ctx["io_cold"] = ctx["io_mbps"] < IO_COLD_MBPS
    return ctx


def contended_verdict(before: dict, after: dict) -> bool:
    """True when the host was busy at measurement START or still
    starved at measurement END. ``after["load1"]`` is deliberately NOT
    consulted: a 32-way Spark run legitimately leaves load1 at 3-6 on
    a clean host, while the single-thread probe runs after the
    executors are idle and only reads slow if a COMPETING workload is
    still live. The multi-core ratio (``_mc_probe_ratio``) IS
    consulted on both sides: the r12 episode showed the hypervisor
    can cap the VM to ~2 effective cores while load1 and the
    single-thread probe read clean — the one regime that uniformly
    inflates every multi-threaded query. Shared by bench.py and
    tools/scale_probe.py so the committed BENCH and ARCHITECTURE
    tables classify runs by one rule."""
    return bool(
        before["load1"] > 1.0
        or before.get("mc_probe_ratio", 0.0) > MC_RATIO_CONTENDED
        or after.get("mc_probe_ratio", 0.0) > MC_RATIO_CONTENDED
        # single cpu-probe gate (ADVICE r12 #1: the historical 0.1 s
        # starvation threshold was strictly subsumed once CPU_SLOW_SEC
        # landed): CPU starvation reads 2x+ and frequency drift ~1.5x,
        # both above the 0.040 s split of the committed clean cluster
        or before["cpu_probe_sec"] > CPU_SLOW_SEC
        or after["cpu_probe_sec"] > CPU_SLOW_SEC
    )


def _ivfpq_split(spark, sf_dir: str) -> tuple[float, float]:
    """(build_sec, query_sec): one cold IVF-PQ train+encode+persist
    into a throwaway dir, then best-of-3 serve_pruned against the
    prebuilt artifacts — the deployment lifecycle, measured as the
    two numbers it actually consists of (VERDICT r10 ask #5)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.operators.pq import serve_pruned
    from sfdata_wrangler_spark.plans.catalog35 import (
        _K,
        _M,
        _N_PROBE,
        _SHORTLIST,
        _SUB_DIM,
        _ivfpq_parts,
    )
    from sfdata_wrangler_spark.sources.lake import write_partitioned

    root = tempfile.mkdtemp(prefix="bench_ivfpq_split_")
    try:
        spark.catalog.clearCache()
        t0 = time.time()
        emb, cents, cb, enc = _ivfpq_parts(spark, sf_dir)
        write_partitioned(
            enc, os.path.join(root, "codes"), ("cid",), dynamic=False,
            cluster=True,
        )
        cents.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "cents")
        )
        cb.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "cb")
        )
        build = time.time() - t0
        cents_r = spark.read.parquet(os.path.join(root, "cents"))
        cb_r = spark.read.parquet(os.path.join(root, "cb"))
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        q_runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            serve_pruned(
                queries, os.path.join(root, "codes"), cents_r, cb_r, emb,
                k=_K, n_probe=_N_PROBE, shortlist=_SHORTLIST,
                m=_M, sub_dim=_SUB_DIM,
            ).count()
            q_runs.append(time.time() - t0)
        return round(build, 3), round(min(q_runs), 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _measure(sf_dir: str) -> tuple[dict, dict]:
    """One full measurement pass: every timed loop, both context
    stamps, the contended/io_cold verdicts. Returns ``(result,
    timings)``. Split from :func:`main` so a contended attempt can be
    re-measured after a settle (VERDICT r12 ask #5)."""
    # io_probe only on the BEFORE side: the suite itself warms the
    # cache, so an after-side read would trivially measure warm
    ctx_before = _run_context(io_probe_dir=sf_dir)
    from sfdata_wrangler_spark.plans import QUERIES
    from sfdata_wrangler_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    from sfdata_wrangler_spark.pipelines.workloads import BENCH_WORKLOADS

    bench_queries = {
        name: spec["fn"] for name, spec in QUERIES.items() if spec["bench"]
    }
    # reference-domain pipelines at sf volume (bench-only: correctness
    # is pinned by the hash-exact fixture queries; this pins wall-time)
    bench_queries.update(BENCH_WORKLOADS)

    # Warm up the JVM/codegen path once with the smallest table so the
    # first measured query doesn't pay session startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Best-of-N per action. The first run pays one-time
    # whole-stage-codegen compilation of the plan (~2s for the widest
    # expression trees), which amortizes to nothing at real scale —
    # steady-state throughput is the meaningful number.
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    noop: dict[str, float] = {}
    for name, fn in bench_queries.items():
        runs = []
        n = 0
        # best-of-N: host-load variance between rounds was measured at
        # +/-30% on single runs; the extra repetition stabilizes the
        # reported best at ~8s added bench wall. The comparable-r2 set
        # gets one extra run so its WARM-run spread (mean +/- stddev,
        # first run excluded — it pays one-time codegen compile) has 3
        # points: VERDICT r6 #6 asked for variance bands so real
        # regressions separate from environment noise.
        # clearCache before every timed run: operators that persist()
        # model-sized intermediates (bigram LM c2, pagerank adjacency,
        # triangle orientation) would otherwise be re-served from the
        # previous run's cache by plan-matching CacheManager lookup,
        # and best-of-N would report the cache-hit cost, not the
        # declared plan's cost.
        n_runs = 4 if name in R2_HEADLINE else 3
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        warm = runs[1:]
        mean = sum(warm) / len(warm)
        var = sum((r - mean) ** 2 for r in warm) / len(warm)
        spread[name] = {
            "mean_warm": round(mean, 3),
            "std_warm": round(var**0.5, 3),
            "runs": [round(r, 3) for r in runs],
        }
        nruns = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            nruns.append(time.time() - t0)
        noop[name] = round(min(nruns), 3)
        print(
            f"# {name}: best={timings[name]:.3f}s "
            f"(cold={runs[0]:.3f}s, noop_sink={noop[name]:.3f}s) "
            f"rows={n}",
            file=sys.stderr,
        )

    # VERDICT r10 ask #5: emb_ivfpq_topk's headline number reads as
    # query latency but ~70% of it is the inline index build it pays
    # every run. Split the lifecycle the way a deployment sees it:
    # ivfpq_build = ONE cold train+encode+persist into a fresh dir
    # (amortized over every query batch served after it);
    # ivfpq_query = best-of-3 serve against those prebuilt artifacts.
    ivfpq_build, ivfpq_query = _ivfpq_split(spark, sf_dir)
    print(
        f"# ivfpq_build={ivfpq_build:.3f}s ivfpq_query={ivfpq_query:.3f}s",
        file=sys.stderr,
    )

    def _sf_of(d: str):
        raw = os.path.basename(d.rstrip("/")).replace("sf", "")
        try:
            return float(raw)
        except ValueError:
            return raw

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        # same-methodology subtotal over exactly the round-2 query set
        # (the headline set grew 11 -> 17 this round; compare THIS to
        # BENCH_r02's value of 6.489)
        "value_comparable_r2": round(
            sum(timings[q] for q in R2_HEADLINE if q in timings), 3
        ),
        # stricter noop-sink timings (full plan, no count-pruning) —
        # see module docstring
        "value_noop_sink": round(sum(noop.values()), 3),
        "queries_noop_sink": noop,
        # per-query variance bands (VERDICT r6 #6): warm-run mean/std
        # plus all raw runs, so a +7% mover can be classified as real
        # or noise without re-running the bench
        "queries_spread": spread,
        "comparable_r2_mean_warm": round(
            sum(spread[q]["mean_warm"] for q in R2_HEADLINE if q in spread),
            3,
        ),
        # independent-noise band for the subtotal: sqrt of summed
        # per-query variances
        "comparable_r2_std_warm": round(
            sum(
                spread[q]["std_warm"] ** 2
                for q in R2_HEADLINE
                if q in spread
            )
            ** 0.5,
            3,
        ),
        # the deployment-relevant headline (VERDICT r9 ask #6)
        "serve_warm": timings.get("emb_ivfpq_serve"),
        # lifecycle split (VERDICT r10 ask #5): one cold index build
        # vs best-of-3 query-against-prebuilt — emb_ivfpq_topk stays
        # for cross-round continuity but its number is build+query
        "ivfpq_build": ivfpq_build,
        "ivfpq_query": ivfpq_query,
        # run-condition stamp (VERDICT r7 #4): load + a single-thread
        # CPU probe before and after, so an inflated total is
        # classifiable as environment (probe also inflated) vs code
        # "after" context + contended verdict are filled in below,
        # AFTER the sf2 loop — stamping here would miss contention
        # that begins during the secondary measurements
    }

    # Secondary scale point (VERDICT r1 item 7): same query set at a
    # second sf so per-query regressions are attributable to plan
    # changes vs data-volume scaling. Extra keys only — the primary
    # metric/value contract is untouched.
    sf_dir2 = os.environ.get("SPARK_GRAFT_SF_DIR2", "/root/testdata/sf0.01")
    if sf_dir2 and sf_dir2 != sf_dir and os.path.isdir(sf_dir2):
        timings2: dict[str, float] = {}
        for name, fn in bench_queries.items():
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf_dir2).count()
                runs.append(time.time() - t0)
            timings2[name] = round(min(runs), 3)
            print(
                f"# [sf2] {name}: best={timings2[name]:.3f}s",
                file=sys.stderr,
            )
        result["sf2"] = _sf_of(sf_dir2)
        result["value_sf2"] = round(sum(timings2.values()), 3)
        result["queries_sf2"] = timings2

    # sf1-class scale point (VERDICT r14 ask #2): the six heaviest
    # queries against a deterministic 10x replica — the scale where
    # 32-way parallelism pays and the driver's 8-core rerun yields
    # meaningful scaling ratios (at sf0.1 every 8v32 ratio was ≤1.17:
    # pure task-scheduling overhead). ONE timed rep per query — these
    # run 10-60 s each, so scheduling noise is proportionally small,
    # and the rep count bounds the added bench wall at both core
    # counts. SPARK_GRAFT_SF1_FACTOR=0 disables.
    sf1_factor = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))
    if sf1_factor > 1:
        sf1_dir = _sf1_dir(sf_dir, sf1_factor)
        if sf1_dir is not None:
            timings1: dict[str, float] = {}
            for name in SF1_QUERIES:
                fn = bench_queries[name]
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, sf1_dir).count()
                timings1[name] = round(time.time() - t0, 3)
                print(
                    f"# [sf1 {sf1_factor}x] {name}: {timings1[name]:.3f}s",
                    file=sys.stderr,
                )
            result["sf1_factor"] = sf1_factor
            result["value_sf1"] = round(sum(timings1.values()), 3)
            result["queries_sf1"] = timings1

    # low-core cross-check (VERDICT r14 ask #9): a fresh local[8]
    # subprocess re-times the comparable-r2 set. 8 cores beating this
    # run's 32-core subtotal by >15% is the frequency-drift signature
    # none of the other probes see. Skipped when the bench itself runs
    # at <=8 cores (the driver's low-core rerun) — the ratio would be
    # self-comparison.
    main_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    result["c8_comparable_r2"] = None
    result["suspect_freq_drift"] = None
    if main_cpus > 8 and os.environ.get(
        "SPARK_GRAFT_LOWCORE_PROBE", "1"
    ) != "0":
        lp = _lowcore_probe(sf_dir, 8)
        if lp is not None:
            result["c8_comparable_r2"] = lp["total"]
            result["suspect_freq_drift"] = bool(
                lp["total"] < 0.85 * result["value_comparable_r2"]
            )
            print(
                f"# c8_comparable_r2={lp['total']:.3f}s vs 32-core "
                f"{result['value_comparable_r2']:.3f}s "
                f"suspect={result['suspect_freq_drift']}",
                file=sys.stderr,
            )

    # Run-condition stamp (VERDICT r7 #4) + contention verdict
    # (VERDICT r10 ask #8: the r10 driver snapshot ran at load1 5.83
    # and read 0.81x vs the clean 0.61x). Taken LAST — after every
    # timed loop including sf2 (code-review r11: an earlier stamp
    # missed contention starting during the secondary measurements).
    # Thresholds and the after.load1 exclusion: see contended_verdict.
    # Compare round-over-round deltas only between clean-stamped runs.
    ctx_after = _run_context()
    result["run_context"] = {"before": ctx_before, "after": ctx_after}
    result["contended"] = contended_verdict(ctx_before, ctx_after)
    # page-cache verdict kept SEPARATE from `contended` (VERDICT r11
    # ask #4): a cold cache inflates IO-bound keys (serve_warm) without
    # any CPU contention, and folding it into `contended` would change
    # that verdict's cross-round meaning. An io_cold run's timings need
    # a quiet re-run before being compared round-over-round. None (json
    # null) = the probe had nothing measurable — distinct from a
    # measured-warm False (code-review r12 pass-2 #2: an unmeasured dir
    # must not present as measured-clean).
    result["io_cold"] = ctx_before.get("io_cold")
    return result, timings


def pick_cleaner(first: dict, second: dict) -> int:
    """Which of two measurement attempts to commit (0 or 1): a clean
    attempt beats a contended one; same verdict → the lower
    comparable-r2 subtotal (contention only ever INFLATES timings, so
    lower = less contaminated). Pure function, unit-tested."""
    if first["contended"] != second["contended"]:
        return 1 if first["contended"] else 0
    return (
        1
        if second["value_comparable_r2"] < first["value_comparable_r2"]
        else 0
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    result, timings = _measure(sf_dir)

    # auto-requeue (VERDICT r12 ask #5): three consecutive driver
    # snapshots were stamped contended, making the committed BENCH
    # table unusable as the round-over-round record. When the verdict
    # trips, settle briefly and measure ONCE more; commit the cleaner
    # attempt with BOTH attempts stamped. Bounded: one retry, one
    # settle — a persistently loud host stays contended honestly.
    if result["contended"] and os.environ.get(
        "SPARK_GRAFT_BENCH_REQUEUE", "1"
    ) != "0":
        settle = float(
            os.environ.get("SPARK_GRAFT_BENCH_SETTLE_SEC", "120")
        )
        print(
            f"# contended on attempt 1 (load1="
            f"{result['run_context']['before']['load1']}, cpu_probe="
            f"{result['run_context']['before']['cpu_probe_sec']}) — "
            f"settling {settle:.0f}s and re-measuring once",
            file=sys.stderr,
        )
        # commit attempt 1's record BEFORE the settle+retry: a harness
        # that times bench out mid-retry would otherwise capture NO
        # JSON at all (parsed=null — strictly worse than a contended
        # number). The driver parses the LAST JSON line in its tail
        # window, so a completed attempt 2 overrides these lines and
        # a killed one leaves attempt 1 as the stamped record.
        interim = dict(result, requeue_pending=True)
        print(json.dumps(interim))
        print(compact_line(interim, timings))
        sys.stdout.flush()
        time.sleep(settle)
        result2, timings2 = _measure(sf_dir)
        keep = pick_cleaner(result, result2)
        other = (result2, result)[keep]
        if keep == 1:
            result, timings = result2, timings2
        result["requeue"] = {
            "attempt_kept": keep + 1,
            "settle_sec": settle,
            # the discarded attempt's verdict-relevant fields, so the
            # committed artifact shows the environment never settled
            # vs settled — both attempts stamped, per the ask
            "other_attempt": {
                "contended": other["contended"],
                "io_cold": other.get("io_cold"),
                "value": other["value"],
                "value_comparable_r2": other["value_comparable_r2"],
                "serve_warm": other["serve_warm"],
                "run_context": other["run_context"],
            },
        }

    # Full detail first; COMPACT summary LAST. The driver records only
    # the final ~2000 chars of stdout and parses a JSON line out of it
    # — round 4's full dump overflowed that window and the driver
    # recorded parsed=null (VERDICT r4 item 7). The last line keeps the
    # contract fields ({metric, value, unit, queries, sf}) but trims
    # the queries dict to the round-2-comparable headline set so it
    # always fits.
    print(json.dumps(result))
    # Complete per-query detail survives the tail truncation here
    # (committed each round so BENCH history stays inspectable).
    try:
        detail_path = os.path.join(
            os.environ.get(
                "SPARK_GRAFT_BENCH_DETAIL_DIR",
                os.path.dirname(os.path.abspath(__file__)),
            ),
            "BENCH_FULL_latest.json",
        )
        with open(detail_path, "w") as fh:
            json.dump(result, fh, indent=1)
    except OSError:
        pass
    print(compact_line(result, timings))


def compact_line(result: dict, timings: dict) -> str:
    """The one JSON line the driver's ~2000-char tail window parses.
    VERDICT r9 #4 (process nit): the old compact line trimmed
    ``queries`` to the 11 round-2 names, so the committed BENCH_r0N
    artifact carried only a third of the per-query timings and
    round-over-round comparison needed the separately committed
    BENCH_FULL_latest.json. The full per-query dict fits the window
    once the noop/spread dicts stay in the detail dump only
    (~32 × ~30 chars ≈ 1 KB), so emit ALL timings here and degrade
    stepwise — first back to the r2 set, then to no dict — only if a
    future query explosion overflows 1900 chars (a raised assert
    would suppress the line entirely and reproduce the parsed=null
    failure this exists to prevent)."""
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        # 2-decimal per-query values in the COMPACT line only (full
        # 3-decimal dict in BENCH_FULL_latest.json): the ~30 chars
        # saved are what keeps queries_sf1 + noop_vals inside the
        # 2000-char tail window
        "queries": {q: round(s, 2) for q, s in timings.items()},
        "sf": result["sf"],
        "value_comparable_r2": result["value_comparable_r2"],
        "value_noop_sink": result["value_noop_sink"],
        "comparable_r2_mean_warm": result["comparable_r2_mean_warm"],
        "comparable_r2_std_warm": result["comparable_r2_std_warm"],
        # the deployment-relevant headline (VERDICT r9 ask #6): warm
        # serve latency against the persisted IVF-PQ lake — regressed
        # against BASELINE.md's serve_warm engine-target row
        "serve_warm": timings.get("emb_ivfpq_serve"),
        # lifecycle split + contention verdict (VERDICT r10 asks #5/#8)
        "ivfpq_build": result["ivfpq_build"],
        "ivfpq_query": result["ivfpq_query"],
        "contended": result["contended"],
        # page-cache stamp (VERDICT r11 ask #4) — see main(); None =
        # nothing measurable, distinct from measured-warm False
        "io_cold": result.get("io_cold"),
        # only the contention discriminators; the full run_context
        # (cpus, tty bits) stays in BENCH_FULL_latest.json — the
        # compact window is the scarce resource here
        "run_context": {
            side: {
                k: result["run_context"][side][k]
                for k in ("cpu_probe_sec", "load1", "mc_probe_ratio")
                if k in result["run_context"][side]
            }
            for side in ("before", "after")
        },
    }
    # per-query noop-sink seconds, aligned with the `queries` dict's
    # key order (VERDICT r14 ask #1: promote the full-plan timings
    # alongside count() — count() prunes aggregate work and both hid
    # real costs and charged persist fills as regressions). A values
    # ARRAY instead of a named dict: ~190 chars vs ~1 KB, which is
    # what lets it fit the driver's 2000-char tail window; the named
    # dict stays in BENCH_FULL_latest.json as queries_noop_sink.
    compact["noop_vals"] = [
        round(result.get("queries_noop_sink", {}).get(q, 0.0), 2)
        for q in timings
    ]
    if "value_sf2" in result:
        # secondary scale point subtotal (VERDICT r13 ask #6): carried
        # in the committed BENCH_r{N} artifact so per-query
        # regressions stay attributable to plan changes vs data
        # volume round-over-round; per-query sf2 timings remain in
        # BENCH_FULL_latest.json (the compact window can't fit both
        # dicts)
        compact["sf2"] = result["sf2"]
        compact["value_sf2"] = result["value_sf2"]
    if "value_sf1" in result:
        # sf1-class scale point (VERDICT r14 ask #2): per-query dict
        # INCLUDED (6 entries) because the driver attributes 8v32
        # scaling per query from the parsed compact lines of its two
        # runs; 2-decimal values bound the cost
        compact["sf1_factor"] = result["sf1_factor"]
        compact["value_sf1"] = result["value_sf1"]
        compact["queries_sf1"] = {
            q: round(s, 2) for q, s in result["queries_sf1"].items()
        }
    # low-core cross-check stamp (VERDICT r14 ask #9): null = probe
    # skipped/failed, distinct from a measured-clean False
    compact["c8_comparable_r2"] = result.get("c8_comparable_r2")
    compact["suspect_freq_drift"] = result.get("suspect_freq_drift")
    if "io_mbps" in result["run_context"]["before"]:
        compact["run_context"]["before"]["io_mbps"] = result[
            "run_context"
        ]["before"]["io_mbps"]
    if "requeue" in result:
        # the auto-requeue happened: which attempt this line reports
        # and whether the discarded one was also contended (the
        # never-settled signature). Full detail in BENCH_FULL_latest.
        compact["requeue"] = {
            "attempt_kept": result["requeue"]["attempt_kept"],
            "other_contended": result["requeue"]["other_attempt"][
                "contended"
            ],
        }
    if result.get("requeue_pending"):
        # attempt 1's pre-settle record (see main): a later completed
        # attempt prints its own line after this one and wins the
        # driver's last-JSON-line parse; this marker shows a killed
        # retry for what it was
        compact["requeue_pending"] = True
    line = json.dumps(compact)
    # stepwise degradation, newest additions first (the window is
    # 2000 chars — 1950 leaves newline slack; a raised assert would
    # suppress the line entirely and reproduce the parsed=null failure
    # this exists to prevent)
    if len(line) >= 1950 and "queries_sf1" in compact:
        del compact["queries_sf1"]  # value_sf1 stays
        line = json.dumps(compact)
    if len(line) >= 1950:
        del compact["noop_vals"]
        line = json.dumps(compact)
    if len(line) >= 1950:
        compact["queries"] = {
            q: timings[q] for q in R2_HEADLINE if q in timings
        }
        line = json.dumps(compact)
    if len(line) >= 1950:
        compact["queries"] = {}
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()
