"""IVF-PQ generation rotation (VERDICT r9 ask #2): no-drift rotations
serve identically, drifted batches degrade recall until a refresh
retrains + re-encodes + swaps, and the swap is atomic + readiness-
guarded."""

import math
import os

import pytest

from sfdata_wrangler_spark.operators.ann_refresh import (
    activate_generation,
    current_generation,
    ingest_batch,
    list_imbalance,
    needs_refresh,
    refresh_generation,
    serve_current,
)

D = 8          # m=2 subspaces x sub_dim=4
KW = dict(km_k=4, km_iters=2, n_codes=4, cb_iters=2, m=2, sub_dim=4)
SERVE = dict(k=5, n_probe=1, shortlist=48)


def _vec(center, jitter0):
    v = [center] * D
    v[0] += jitter0
    return v


def _corpus_a():
    # 3 clusters, ids round-robin so the lowest-id k-means seeds spread
    rows = []
    centers = [0.3, -0.3, 0.05]
    for i in range(60):
        rows.append((i, _vec(centers[i % 3], (i // 3) * 0.001)))
    return rows


def _batch_b():
    # the drifted regime: two far-away 60-vector clusters, EACH made
    # of two sub-clusters 1.0 apart (ids 100..159 at +3.5/+4.5,
    # 160..219 at -3.5/-4.5; the HIGH-id half is the far sub-cluster).
    # Pre-refresh, every drifted residual quantizes to the same
    # extreme A-trained code, so all 60 tie in ADC and the
    # tie-broken-by-id shortlist (48 < 60) drops exactly the high-id
    # true neighbors. Post-refresh the residual codebooks separate
    # the ±0.5 sub-cluster masses, so the probed cell's ADC puts the
    # right sub-cluster first.
    rows = []
    for i in range(60):
        rows.append((100 + i, _vec(3.5 if i < 30 else 4.5, i * 0.001)))
    for i in range(60):
        rows.append((160 + i, _vec(-3.5 if i < 30 else -4.5, i * 0.001)))
    return rows


def _queries():
    return [(0, _vec(4.5, 0.059)), (1, _vec(4.5, 0.058)),
            (2, _vec(-4.5, 0.059)), (3, _vec(-4.5, 0.058))]


def _ground_truth(corpus_rows, queries, k=5):
    """Exact integer-micro L2 top-k — the same quantization the
    engine's exact rerank uses."""
    gt = {}
    for qid, q in queries:
        qq = [math.floor(x * 1e6) for x in q]
        scored = []
        for vid, v in corpus_rows:
            vv = [math.floor(x * 1e6) for x in v]
            d2 = sum((a - b) ** 2 for a, b in zip(qq, vv))
            scored.append((d2, vid))
        scored.sort()
        gt[qid] = {vid for _d, vid in scored[:k]}
    return gt


def _recall(spark, root, corpus_df, corpus_rows):
    queries = _queries()
    qdf = spark.createDataFrame(queries, ["query_id", "embedding"])
    got = serve_current(spark, root, qdf, corpus_df, **SERVE).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    gt = _ground_truth(corpus_rows, queries, k=SERVE["k"])
    return sum(
        len(by_q.get(q, set()) & gt[q]) / len(gt[q]) for q in gt
    ) / len(gt)


def test_generation_rotation_and_drift_recovery(spark, tmp_path):
    root = str(tmp_path / "annroot")
    schema = "vec_id long, embedding array<double>"
    a_rows = _corpus_a()
    a_df = spark.createDataFrame(a_rows, schema)

    assert current_generation(spark, root) is None
    gen0 = refresh_generation(spark, root, a_df, **KW)
    assert current_generation(spark, root) == gen0 == "gen-0000"

    # (a) no-drift rotation: the integer trainers are deterministic,
    # so retraining on the SAME corpus swaps to a byte-identical
    # index — serving before and after the rotation agrees exactly
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])
    before = sorted(
        map(tuple, serve_current(spark, root, qdf, a_df, **SERVE).collect())
    )
    gen1 = refresh_generation(spark, root, a_df, **KW)
    assert current_generation(spark, root) == gen1 == "gen-0001"
    after = sorted(
        map(tuple, serve_current(spark, root, qdf, a_df, **SERVE).collect())
    )
    assert before == after

    # (b) drift: ingest the new-regime batch against the FROZEN
    # generation — O(batch), but the hot cells and the stale residual
    # codebooks sink recall for new-regime queries
    b_rows = _batch_b()
    full_rows = a_rows + b_rows
    full_df = spark.createDataFrame(full_rows, schema)
    ingest_batch(spark, root, spark.createDataFrame(b_rows, schema))

    imb_before = list_imbalance(spark, root)
    recall_before = _recall(spark, root, full_df, full_rows)

    gen2 = refresh_generation(spark, root, full_df, **KW)
    assert gen2 == "gen-0002"
    imb_after = list_imbalance(spark, root)
    recall_after = _recall(spark, root, full_df, full_rows)

    assert recall_before <= 0.5, recall_before
    assert recall_after >= 0.9, recall_after
    assert imb_after < imb_before, (imb_before, imb_after)


def test_activate_refuses_half_built_generation(spark, tmp_path):
    root = str(tmp_path / "annroot2")
    with pytest.raises(FileNotFoundError, match="half-built"):
        activate_generation(spark, root, "gen-9999")
    # and serving without any active generation fails loudly
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])
    with pytest.raises(FileNotFoundError, match="no active generation"):
        serve_current(spark, root, qdf, qdf)


def test_needs_refresh_threshold(spark, tmp_path):
    root = str(tmp_path / "annroot3")
    a_df = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    refresh_generation(spark, root, a_df, **KW)
    balanced = list_imbalance(spark, root)
    assert not needs_refresh(spark, root, threshold=balanced + 0.1)
    ingest_batch(
        spark, root,
        spark.createDataFrame(_batch_b(), "vec_id long, embedding array<double>"),
    )
    assert needs_refresh(spark, root, threshold=balanced + 0.1)


def test_rotating_stream_serve_picks_up_new_generation(spark, tmp_path):
    """streaming/ann_stream.stream_ivfpq_serve_rotating re-resolves
    the generation pointer per trigger: a refresh between triggers
    swaps serving without restarting anything — trigger 1 answers
    from the stale generation (drift-degraded), trigger 2 from the
    retrained one (full recall)."""
    import time

    from sfdata_wrangler_spark.streaming.ann_stream import (
        stream_ivfpq_serve_rotating,
    )

    root = str(tmp_path / "rotroot")
    schema = "vec_id long, embedding array<double>"
    a_rows, b_rows = _corpus_a(), _batch_b()
    full_rows = a_rows + b_rows
    a_df = spark.createDataFrame(a_rows, schema)
    full_df = spark.createDataFrame(full_rows, schema)

    refresh_generation(spark, root, a_df, **KW)
    ingest_batch(spark, root, spark.createDataFrame(b_rows, schema))

    qsrc = os.path.join(tmp_path, "qsrc")
    os.makedirs(qsrc)
    qschema = "query_id long, embedding array<double>"
    results = {}

    def sink(df, batch_id):
        by_q = {}
        for r in df.collect():
            by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        results[batch_id] = by_q

    def run_once():
        qstream = spark.readStream.schema(qschema).parquet(qsrc)
        q = (
            stream_ivfpq_serve_rotating(
                qstream, root, full_df, sink, **SERVE
            )
            .option("checkpointLocation", os.path.join(tmp_path, "rotckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    gt = _ground_truth(full_rows, _queries(), k=SERVE["k"])

    def recall(by_q):
        return sum(
            len(by_q.get(q, set()) & gt[q]) / len(gt[q]) for q in gt
        ) / len(gt)

    spark.createDataFrame(_queries(), qschema).coalesce(1).write.mode(
        "append"
    ).parquet(qsrc)
    run_once()
    assert recall(results[0]) <= 0.5, recall(results[0])

    refresh_generation(spark, root, full_df, **KW)
    time.sleep(1.1)
    spark.createDataFrame(_queries(), qschema).coalesce(1).write.mode(
        "append"
    ).parquet(qsrc)
    run_once()
    assert recall(results[1]) >= 0.9, recall(results[1])


def test_gen_name_claim_is_atomic(spark, tmp_path):
    """ADVICE r10 #3 / VERDICT r11 #1: allocation CLAIMS the name via
    an ATOMIC create of <gen>/_claim — java.io.File.createNewFile
    (O_CREAT|O_EXCL) on local FS, since Hadoop's
    FileSystem.createNewFile is exists-then-create and
    LocalFileSystem.create(overwrite=false) re-checks existence
    non-atomically (the r10 fix's TOCTOU, which failed this test
    2-of-3 pre-fix). A second allocator — even one racing before the
    first writes any artifact — gets a fresh name instead of
    interleaving overwrite-writes into the same dir; the claim file
    is underscore-hidden so the unbuilt generation still reads as
    uncommitted. Looped 20× (VERDICT r11 done-bar): the pre-fix race
    lost multiple of 20 rounds, so a deterministic 20/20 pins the
    O_EXCL path."""
    import concurrent.futures as cf

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        _next_gen_name,
    )
    from sfdata_wrangler_spark.sources.lake import has_committed_data

    root = str(tmp_path / "claimroot")
    g0 = _next_gen_name(spark, root)
    g1 = _next_gen_name(spark, root)  # nothing written yet: the race
    assert g0 != g1
    assert not has_committed_data(spark, _gen_dir(root, g0))

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        for i in range(20):
            r = str(tmp_path / f"claimrace{i}")
            names = list(
                pool.map(lambda _: _next_gen_name(spark, r), range(8))
            )
            assert len(set(names)) == 8, (i, sorted(names))


def test_concurrent_refreshes_commit_two_distinct_generations(
    spark, tmp_path
):
    """VERDICT r11 ask #2 — the scenario the atomic claim exists for:
    two FULL refresh_generation calls (claim → train → write →
    activate) racing on one root must land as two DISTINCT committed
    generations (no interleaved overwrite-writes into one dir), with
    ``_current`` pointing at one of them, serve green afterwards, and
    a subsequent gc leaving the keep-window intact. Without the atomic
    claim this test can tear a generation (both racers allocate one
    name and interleave centroids/codes writes)."""
    import concurrent.futures as cf

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        gc_generations,
        is_built,
        list_generations,
    )
    from sfdata_wrangler_spark.sources.lake import has_committed_data

    root = str(tmp_path / "raceroot")
    schema = "vec_id long, embedding array<double>"
    rows = _corpus_a()
    corpus = spark.createDataFrame(rows, schema)
    qdf = spark.createDataFrame(_queries()[:1], ["query_id", "embedding"])

    # retain=None inside the race: gc policy is exercised separately
    # below — racing gc against activate is the (tested) quiet-grace
    # story, not this test's subject
    def one_refresh(_):
        return refresh_generation(spark, root, corpus, retain=None, **KW)

    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        gens = list(pool.map(one_refresh, range(2)))

    assert len(set(gens)) == 2, gens
    on_disk = list_generations(spark, root)
    assert sorted(gens) == on_disk, (gens, on_disk)
    for g in gens:
        assert is_built(spark, root, g)
        for part in ("centroids", "codebooks", "codes"):
            assert has_committed_data(spark, f"{_gen_dir(root, g)}/{part}")
    cur = current_generation(spark, root)
    assert cur in gens
    # serving resolves a committed generation and answers
    assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0
    # both racers' generations are in the activated chain (each swap
    # back-marks the superseded one), so keep=2 protects both
    assert gc_generations(spark, root, keep=2) == []
    assert list_generations(spark, root) == on_disk
    # the deterministic trainers make the two generations byte-equal in
    # content, so whichever won the pointer race, serving is identical
    assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0


def test_first_activation_gc_loss_clears_pointer(spark, tmp_path):
    """ADVICE r11 #2: when the FIRST-ever activation loses the gc race
    (codes swept between readiness check and post-swap re-verify),
    there is no previous pointer to restore — activate must remove
    ``_current`` before raising, so readers see "no current
    generation" instead of resolving a gutted one."""
    import shutil

    import sfdata_wrangler_spark.operators.ann_refresh as ar

    root = str(tmp_path / "firstloss")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    gen = ar._next_gen_name(spark, root)
    c, cb, enc = ar.train_generation(corpus, **KW)
    ar.write_generation(
        spark, root, gen, c, cb, enc,
        meta={"m": KW["m"], "sub_dim": KW["sub_dim"]},
    )

    # simulate the concurrent gc landing between the pre-swap readiness
    # checks and the post-swap re-verify: pass the first codes check,
    # then gut codes before the second one runs
    real = ar.has_committed_data
    codes_dir = f"{ar._gen_dir(root, gen)}/codes"
    seen = {"codes_checks": 0}

    def racy(spark_, path):
        if path == codes_dir:
            seen["codes_checks"] += 1
            if seen["codes_checks"] == 2:
                shutil.rmtree(codes_dir)  # the "concurrent gc"
        return real(spark_, path)

    ar.has_committed_data = racy
    try:
        with pytest.raises(FileNotFoundError, match="lost its committed"):
            ar.activate_generation(spark, root, gen)
    finally:
        ar.has_committed_data = real

    # the pointer was REMOVED, not left on the gutted generation
    assert current_generation(spark, root) is None
    qdf = spark.createDataFrame(_queries()[:1], ["query_id", "embedding"])
    with pytest.raises(FileNotFoundError, match="no active generation"):
        serve_current(spark, root, qdf, corpus, **SERVE)
    assert serve_current(
        spark, root, qdf, corpus, missing_ok=True, **SERVE
    ) is None


def test_generation_retention_bounds_disk_and_keeps_serving(
    spark, tmp_path
):
    """VERDICT r10 ask #2: rotate THRICE with retain=2 — disk stays
    bounded at 2 generations, serve is green after every rotation,
    and a reader that resolved generation N just before the swap to
    N+1 still collects (N's deletion is deferred one full rotation).
    A grace age defers deletion; the pointer's generation is never
    swept even when it falls outside the newest-K window."""
    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        gc_generations,
        list_generations,
    )

    root = str(tmp_path / "gcroot")
    schema = "vec_id long, embedding array<double>"
    rows = _corpus_a()
    corpus = spark.createDataFrame(rows, schema)
    qdf = spark.createDataFrame(_queries()[:1], ["query_id", "embedding"])

    gens_seen = []
    inflight = None
    for i in range(3):
        if i == 2:
            # reader resolves the CURRENT generation (gen-0001) right
            # before the third rotation supersedes it
            inflight = serve_current(spark, root, qdf, corpus, **SERVE)
        gen = refresh_generation(spark, root, corpus, **KW)
        gens_seen.append(gen)
        on_disk = list_generations(spark, root)
        assert len(on_disk) <= 2, on_disk
        assert current_generation(spark, root) == gen == on_disk[-1]
        assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0
    assert gens_seen == ["gen-0000", "gen-0001", "gen-0002"]
    assert list_generations(spark, root) == ["gen-0001", "gen-0002"]
    # the in-flight plan against gen-0001 survives rotation 3
    assert inflight.count() > 0

    # grace age: a fresh superseded generation is NOT deleted yet
    refresh_generation(
        spark, root, corpus, retain=1, grace_age_s=3600.0, **KW
    )
    assert "gen-0002" in list_generations(spark, root)
    # explicit gc with no grace trims to exactly the active one
    deleted = gc_generations(spark, root, keep=1)
    assert current_generation(spark, root) == "gen-0003"
    assert list_generations(spark, root) == ["gen-0003"]
    assert "gen-0002" in deleted

    # a pointer pinned on an OLD generation protects it from gc
    from sfdata_wrangler_spark.sources.lake import atomic_write_text

    atomic_write_text(spark, f"{root}/_current", "gen-0003")
    # build two more generations WITHOUT activating them
    from sfdata_wrangler_spark.operators.ann_refresh import (
        _next_gen_name,
        train_generation,
        write_generation,
    )

    for _ in range(2):
        g = _next_gen_name(spark, root)
        c, cb, enc = train_generation(corpus, **KW)
        write_generation(
            spark, root, g, c, cb, enc,
            meta={"m": KW["m"], "sub_dim": KW["sub_dim"]},
        )
    gc_generations(spark, root, keep=1)
    # newest-1 = gen-0005, but the pointer's gen-0003 must survive
    assert "gen-0003" in list_generations(spark, root)
    assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0


def test_concurrent_rotation_chaos_invariants(spark, tmp_path):
    """Invariant sweep under concurrent rotation + retention + serving:
    two writer threads each run two full ``refresh_generation`` calls
    (retain=2, zero grace — auto-gc races the activates) while a
    reader loops ``serve_current(missing_ok=True)``. Asserted contract:

    - most reads succeed with exactly-k rows per query (no torn
      results — a read either answers completely or errors; the only
      tolerated error class is a generation swept under an in-flight
      plan when TWO rotations complete within one read, the documented
      keep=2 limitation);
    - the final pointer names a BUILT generation with committed codes;
    - every surviving generation dir is either fully committed or a
      bare claim (no half-built artifact mixtures — the atomic claim's
      whole point);
    - disk is bounded: at most retain built generations survive plus
      concurrent claims."""
    import concurrent.futures as cf
    import threading

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        is_built,
        list_generations,
    )
    from sfdata_wrangler_spark.sources.lake import has_committed_data

    root = str(tmp_path / "chaosroot")
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(_corpus_a(), schema)
    qdf = spark.createDataFrame(_queries()[:2], ["query_id", "embedding"])

    done = threading.Event()
    reads = {"ok": 0, "none": 0, "err": 0}
    torn: list = []  # invariant violations — asserted in MAIN thread
    qids = {q[0] for q in _queries()[:2]}

    def reader():
        # violations are COLLECTED, not raised: an exception in a
        # daemon thread cannot fail a pytest test (code-review r12
        # pass-3 #1 — the earlier `raise` was silently unenforced)
        while not done.is_set():
            try:
                got = serve_current(
                    spark, root, qdf, corpus, missing_ok=True, **SERVE
                )
                if got is None:
                    reads["none"] += 1
                    continue
                rows = got.collect()
                by_q = {}
                for r in rows:
                    by_q.setdefault(r["query_id"], []).append(r)
                # complete answer: BOTH queries present (an empty or
                # query-dropping result must not count — pass-3 #3),
                # each with exactly k hits
                if set(by_q) != qids or any(
                    len(v) != SERVE["k"] for v in by_q.values()
                ):
                    torn.append({k: len(v) for k, v in by_q.items()})
                    continue
                reads["ok"] += 1
            except Exception:
                # double-rotation sweep under an in-flight plan — the
                # documented keep=2 residual window; tolerated, counted
                # and BOUNDED below
                reads["err"] += 1

    def writer(_):
        for _ in range(2):
            refresh_generation(
                spark, root, corpus, retain=2, grace_age_s=0.0, **KW
            )

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()
    try:
        with cf.ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(writer, range(2)))
    finally:
        done.set()
        rt.join(timeout=60)

    # no torn results, real reader progress, and errors bounded by the
    # residual window's capacity: 4 rotations total and one in-flight
    # read each can strand — a serve path that crashes on every swap
    # would blow far past this (pass-3 #4)
    assert torn == [], torn
    assert reads["ok"] >= 1, reads
    assert reads["err"] <= 4, reads

    cur = current_generation(spark, root)
    assert cur is not None and is_built(spark, root, cur)
    gens = list_generations(spark, root)
    assert cur in gens
    built = []
    for g in gens:
        parts = [
            has_committed_data(spark, f"{_gen_dir(root, g)}/{p}")
            for p in ("centroids", "codebooks", "codes")
        ]
        if is_built(spark, root, g):
            assert all(parts), (g, parts)  # no half-built mixtures
            built.append(g)
        else:
            assert not any(parts), (g, parts)  # bare claim only
    assert cur in built
    assert len(built) <= 3  # retain=2 plus at most one mid-claim build
    # steady state serves green
    assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0


def test_heartbeat_rearms_quiet_grace(spark, tmp_path):
    """ADVICE r11 #3: a slow concurrent builder re-touches its gen dir
    so the quiet-grace sweep never fires under a live build — the
    heartbeat bumps the subtree mtime gc's recursive scan reads."""
    import time

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _next_gen_name,
        gc_generations,
        heartbeat_generation,
        list_generations,
    )

    root = str(tmp_path / "hbroot")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    refresh_generation(spark, root, corpus, retain=None, **KW)  # gen-0000
    slow = _next_gen_name(spark, root)  # claimed, never built

    time.sleep(1.2)
    heartbeat_generation(spark, root, slow)
    # a 1s quiet bar would have swept the claim without the heartbeat
    # (it is >1.2s old); with it the subtree is fresh and survives
    assert gc_generations(spark, root, keep=1, unbuilt_grace_s=1.0) == []
    assert slow in list_generations(spark, root)
    # zero grace still sweeps — heartbeat hides nothing from an
    # explicit operator decision
    assert gc_generations(spark, root, keep=1, unbuilt_grace_s=0.0) == [slow]


def test_gc_spares_concurrent_built_unactivated_generation(spark, tmp_path):
    """code-review r11: a slower concurrent refresh that has BUILT its
    generation but not yet activated it must survive other rotations'
    auto-gc (default zero grace) — sweeping it would crash its
    activate or strand the pointer. Activated-and-superseded
    generations still retention-sweep normally."""
    from sfdata_wrangler_spark.operators.ann_refresh import (
        _next_gen_name,
        gc_generations,
        list_generations,
        train_generation,
        write_generation,
    )

    root = str(tmp_path / "gcroot3")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    refresh_generation(spark, root, corpus, retain=None, **KW)  # gen-0000

    # slow refresh claims + builds gen-0001 but has not activated yet
    slow = _next_gen_name(spark, root)
    c, cb, enc = train_generation(corpus, **KW)
    write_generation(
        spark, root, slow, c, cb, enc,
        meta={"m": KW["m"], "sub_dim": KW["sub_dim"]},
    )

    # two fast rotations with aggressive retention race past it
    refresh_generation(spark, root, corpus, retain=1, **KW)  # gen-0002
    refresh_generation(spark, root, corpus, retain=1, **KW)  # gen-0003
    assert slow in list_generations(spark, root)
    # the superseded ACTIVATED gens were retention-swept as usual
    assert "gen-0000" not in list_generations(spark, root)
    assert "gen-0002" not in list_generations(spark, root)

    # the slow refresh completes: activation still works
    activate_generation(spark, root, slow)
    assert current_generation(spark, root) == slow

    # once activated (chain member) and superseded, it sweeps normally
    refresh_generation(spark, root, corpus, retain=1, **KW)
    assert gc_generations(spark, root, keep=1) == [slow] or (
        slow not in list_generations(spark, root)
    )


def test_activate_backmarks_premigration_current(spark, tmp_path):
    """code-review r11: a lake whose generations predate the
    _activated marker must not lose its just-superseded serving
    generation to the quiet rule — activation back-marks the
    superseded current, admitting it to the keep-window chain."""
    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        gc_generations,
        list_generations,
        was_activated,
    )

    root = str(tmp_path / "legacy")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    refresh_generation(spark, root, corpus, retain=None, **KW)  # gen-0000
    refresh_generation(spark, root, corpus, retain=None, **KW)  # gen-0001
    # simulate a pre-marker lake
    for g in ("gen-0000", "gen-0001"):
        os.remove(f"{_gen_dir(root, g)}/_activated")
        assert not was_activated(spark, root, g)

    # first post-upgrade rotation: gen-0001 (the serving gen being
    # superseded) is back-marked into the chain and keep=2 protects it
    refresh_generation(spark, root, corpus, retain=2, **KW)  # gen-0002
    assert was_activated(spark, root, "gen-0001")
    assert "gen-0001" in list_generations(spark, root)
    # gen-0000 (unmarked, long superseded) sits under the quiet rule:
    # survives the default 24h grace, swept by an explicit zero-grace gc
    assert "gen-0000" in list_generations(spark, root)
    deleted = gc_generations(spark, root, keep=2, unbuilt_grace_s=0.0)
    assert deleted == ["gen-0000"]
    assert list_generations(spark, root) == ["gen-0001", "gen-0002"]


def test_gc_ignores_unbuilt_claims_and_sorts_numerically(spark, tmp_path):
    """code-review r11 #1/#3/#4: a claimed-but-unbuilt generation must
    not occupy a keep-window slot (that would push the just-superseded
    serving generation out and delete it one rotation early); unbuilt
    dirs are GC'd only under their own 24h-quiet rule; and generation
    order is numeric, so gen-10000 counts as newer than gen-9999."""
    import json as _json

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        gc_generations,
        is_built,
        list_generations,
    )

    root = str(tmp_path / "gcroot2")
    corpus = spark.createDataFrame(_corpus_a(), "vec_id long, embedding array<double>")
    qdf = spark.createDataFrame(_queries()[:1], ["query_id", "embedding"])

    # two rotations -> gen-0000 superseded, gen-0001 serving
    refresh_generation(spark, root, corpus, retain=None, **KW)
    refresh_generation(spark, root, corpus, retain=None, **KW)

    # a refresh claims gen-0002 and "crashes" before building anything
    os.makedirs(f"{root}/generations/gen-0002")
    open(f"{root}/generations/gen-0002/_claim", "w").close()
    assert not is_built(spark, root, "gen-0002")

    # keep=2 must protect the two BUILT generations (0000 serving a
    # hypothetical in-flight reader, 0001 current) — the claim dir
    # must not consume a slot, and being young it survives its own rule
    deleted = gc_generations(spark, root, keep=2)
    assert deleted == []
    assert sorted(list_generations(spark, root)) == [
        "gen-0000", "gen-0001", "gen-0002"
    ]

    # the unbuilt rule: quiet past unbuilt_grace_s -> swept
    deleted = gc_generations(spark, root, keep=2, unbuilt_grace_s=0.0)
    assert deleted == ["gen-0002"]
    assert "gen-0000" in list_generations(spark, root)  # still protected

    # numeric ordering: fabricate built gen-9999 / gen-10000 and point
    # the pointer at gen-10000; keep=2's newest-two must be
    # {gen-9999, gen-10000} numerically, NOT {gen-10000, gen-9999
    # -as-newest-string}, so the OLD gen-0000/0001 get swept instead
    for g in ("gen-9999", "gen-10000"):
        src = _gen_dir(root, "gen-0001")
        dst = _gen_dir(root, g)
        import shutil

        shutil.copytree(src, dst)
    from sfdata_wrangler_spark.sources.lake import atomic_write_text

    atomic_write_text(spark, f"{root}/_current", "gen-10000")
    assert list_generations(spark, root)[-2:] == ["gen-9999", "gen-10000"]
    deleted = gc_generations(spark, root, keep=2)
    assert set(deleted) == {"gen-0000", "gen-0001"}
    assert list_generations(spark, root) == ["gen-9999", "gen-10000"]
    assert serve_current(spark, root, qdf, corpus, **SERVE).count() > 0


def test_gen_age_maps_only_real_java_fnf(spark, tmp_path, monkeypatch):
    """VERDICT r12 ask #4: the vanished-mid-scan tolerance must key on
    the exception's JAVA CLASS (java.io.FileNotFoundException or a
    subclass), never on substring matching — an exception whose
    MESSAGE mentions the class name, or a permission failure, must
    re-raise so the retention sweep stays loud."""
    from py4j.protocol import Py4JJavaError

    from sfdata_wrangler_spark.operators import ann_refresh as ar

    jvm = spark.sparkContext._jvm
    # the exact class the FileSystem API throws for a vanished path
    assert ar._is_java_fnf(jvm.java.io.FileNotFoundException("gone"))
    # a PermissionError-shaped failure is NOT vanished, even when its
    # message name-drops the class substring matching keyed on
    assert not ar._is_java_fnf(
        jvm.java.nio.file.AccessDeniedException(
            "java.io.FileNotFoundException mentioned in message"
        )
    )
    assert not ar._is_java_fnf(
        jvm.java.io.IOException("java.io.FileNotFoundException")
    )
    assert not ar._is_java_fnf(None)

    # end-to-end through _gen_age_s: FNF -> None, permission -> raise
    def _fs_raising(exc):
        class _FS:
            def getFileStatus(self, p):
                raise Py4JJavaError("op failed", exc)

        return _FS()

    monkeypatch.setattr(
        ar,
        "hadoop_fs",
        lambda s, r: (
            _fs_raising(jvm.java.nio.file.AccessDeniedException("denied")),
            None,
            jvm,
        ),
    )
    with pytest.raises(Py4JJavaError):
        ar._gen_age_s(spark, str(tmp_path), "gen-0000")
    monkeypatch.setattr(
        ar,
        "hadoop_fs",
        lambda s, r: (
            _fs_raising(jvm.java.io.FileNotFoundException("gone")),
            None,
            jvm,
        ),
    )
    assert ar._gen_age_s(spark, str(tmp_path), "gen-0000") is None


def _serve_sorted(rows):
    return sorted(
        (r["query_id"], r["vec_id"], r["adc_d2"], r["exact_d2"], r["rank"])
        for r in rows
    )


def test_tombstone_serve_equals_index_minus_codes(spark, tmp_path):
    """VERDICT r12 ask #1, the deletion contract: serving with
    tombstones is VALUE-IDENTICAL to serving the same frozen
    generation with the tombstoned ids' codes physically removed —
    the anti-join lands before the shortlist, so a deleted id can
    neither occupy a slot nor displace a live candidate."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        generation_meta,
        tombstone_ids,
    )
    from sfdata_wrangler_spark.operators.pq import serve_pruned

    root = str(tmp_path / "tsroot")
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(_corpus_a(), schema)
    refresh_generation(spark, root, corpus, **KW)
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])

    base = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    # victims drawn FROM the baseline results, so the delete must
    # visibly change them (a vacuous exclusion would prove nothing)
    victims = sorted({r["vec_id"] for r in base})[:3]
    gen = tombstone_ids(
        spark, root,
        spark.createDataFrame([(int(v),) for v in victims], "vec_id long"),
    )

    got = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    got_ids = {r["vec_id"] for r in got}
    assert not (got_ids & set(victims))
    assert _serve_sorted(got) != _serve_sorted(base)
    # still a COMPLETE answer: k rows per query
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == SERVE["k"] for v in by_q.values())

    # the ground-truth twin: same generation artifacts, codes filtered
    gdir = _gen_dir(root, gen)
    meta = generation_meta(spark, root, gen)
    filtered = str(tmp_path / "filtered_codes")
    spark.read.parquet(f"{gdir}/codes").where(
        ~F.col("vec_id").isin([int(v) for v in victims])
    ).write.partitionBy("cid").parquet(filtered)
    twin = serve_pruned(
        qdf, filtered,
        spark.read.parquet(f"{gdir}/centroids"),
        spark.read.parquet(f"{gdir}/codebooks"),
        corpus,
        m=int(meta["m"]), sub_dim=int(meta["sub_dim"]), **SERVE,
    ).collect()
    assert _serve_sorted(got) == _serve_sorted(twin)

    # idempotent under re-issue (appends accumulate, serve distincts)
    tombstone_ids(
        spark, root,
        spark.createDataFrame([(int(v),) for v in victims], "vec_id long"),
    )
    again = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    assert _serve_sorted(again) == _serve_sorted(got)


def test_refresh_folds_tombstones_and_clears_them(spark, tmp_path):
    """Tombstones never outlive one rotation: the next
    refresh_generation anti-joins them out of the corpus, so the new
    generation physically lacks the deleted codes, starts with an
    empty tombstone table, and is BITWISE the generation a retrain on
    corpus-minus-rows produces (integer training is a pure function
    of its input set)."""
    from pyspark.sql import functions as F

    from sfdata_wrangler_spark.operators.ann_refresh import (
        _gen_dir,
        generation_tombstones,
        tombstone_ids,
    )

    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(_corpus_a(), schema)
    victims = [6, 7, 8]
    qdf = spark.createDataFrame(_queries(), ["query_id", "embedding"])

    root = str(tmp_path / "foldroot")
    refresh_generation(spark, root, corpus, **KW)
    tombstone_ids(
        spark, root,
        spark.createDataFrame([(v,) for v in victims], "vec_id long"),
    )
    refresh_generation(spark, root, corpus, **KW)

    gen2 = current_generation(spark, root)
    codes2 = spark.read.parquet(f"{_gen_dir(root, gen2)}/codes")
    assert codes2.where(F.col("vec_id").isin(victims)).count() == 0
    assert generation_tombstones(spark, root, gen2) is None

    # twin lake trained directly on corpus-minus-victims
    twin_root = str(tmp_path / "twinroot")
    refresh_generation(
        spark, twin_root, corpus.where(~F.col("vec_id").isin(victims)), **KW
    )
    got = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    twin = serve_current(spark, twin_root, qdf, corpus, **SERVE).collect()
    assert _serve_sorted(got) == _serve_sorted(twin)
    assert not ({r["vec_id"] for r in got} & set(victims))


def test_tombstone_mid_rotation_chaos(spark, tmp_path):
    """Chaos extension for the deletion path (VERDICT r12 ask #1): a
    tombstoner thread fires takedowns while two writers rotate
    (retain=2, zero grace) and a reader serves. Asserted contract:

    - reads stay complete (k rows per query) or error within the
      documented keep=2 residual window — a tombstone landing
      mid-serve must never produce a TORN (partial) answer;
    - the documented resurrection race is bounded: a rotation that
      TRAINED before a takedown can serve the victim again, so the
      invariant is not "victims never appear" mid-chaos but "a
      re-issued takedown after quiescence excludes them" — the
      caller-re-issues rule from tombstone_ids' docstring;
    - the final lake is servable and its pointer generation is built."""
    import concurrent.futures as cf
    import threading

    from sfdata_wrangler_spark.operators.ann_refresh import (
        is_built,
        tombstone_ids,
    )

    root = str(tmp_path / "tschaos")
    schema = "vec_id long, embedding array<double>"
    corpus = spark.createDataFrame(_corpus_a(), schema)
    qdf = spark.createDataFrame(_queries()[:2], ["query_id", "embedding"])
    victims = [6, 7, 8]
    vdf = spark.createDataFrame([(v,) for v in victims], "vec_id long")

    done = threading.Event()
    reads = {"ok": 0, "none": 0, "err": 0}
    stones = {"ok": 0, "err": 0}
    torn: list = []
    qids = {q[0] for q in _queries()[:2]}

    def reader():
        while not done.is_set():
            try:
                got = serve_current(
                    spark, root, qdf, corpus, missing_ok=True, **SERVE
                )
                if got is None:
                    reads["none"] += 1
                    continue
                by_q = {}
                for r in got.collect():
                    by_q.setdefault(r["query_id"], []).append(r)
                if set(by_q) != qids or any(
                    len(v) != SERVE["k"] for v in by_q.values()
                ):
                    torn.append({k: len(v) for k, v in by_q.items()})
                    continue
                reads["ok"] += 1
            except Exception:
                reads["err"] += 1  # swept-mid-plan residual window

    def tombstoner():
        while not done.is_set():
            try:
                tombstone_ids(spark, root, vdf)
                stones["ok"] += 1
            except Exception:
                # no active generation yet, or the target generation
                # was swept mid-append — the takedown is re-issued by
                # the next loop iteration (the documented rule)
                stones["err"] += 1

    def writer(_):
        for _ in range(2):
            refresh_generation(
                spark, root, corpus, retain=2, grace_age_s=0.0, **KW
            )

    rt = threading.Thread(target=reader, daemon=True)
    tt = threading.Thread(target=tombstoner, daemon=True)
    rt.start()
    tt.start()
    try:
        with cf.ThreadPoolExecutor(max_workers=2) as pool:
            list(pool.map(writer, range(2)))
    finally:
        done.set()
        rt.join(timeout=60)
        tt.join(timeout=60)

    assert torn == [], torn
    assert reads["ok"] >= 1, reads
    assert reads["err"] <= 4, reads
    assert stones["ok"] >= 1, stones

    cur = current_generation(spark, root)
    assert cur is not None and is_built(spark, root, cur)
    # quiescent re-issue: the takedown now sticks for every later serve
    tombstone_ids(spark, root, vdf)
    final = serve_current(spark, root, qdf, corpus, **SERVE).collect()
    by_q = {}
    for r in final:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == qids
    assert all(len(v) == SERVE["k"] for v in by_q.values())
    assert not ({r["vec_id"] for r in final} & set(victims))


def test_tombstone_fraction_drives_needs_refresh(spark, tmp_path):
    """Deletion debt as a rotation trigger: fraction is 0.0 with no
    tombstones, counts DISTINCT ids (re-issued takedowns don't inflate
    it), trips needs_refresh past the threshold, and resets to 0.0
    after the fold-away refresh."""
    from sfdata_wrangler_spark.operators.ann_refresh import (
        tombstone_fraction,
        tombstone_ids,
    )

    root = str(tmp_path / "tfroot")
    corpus = spark.createDataFrame(
        _corpus_a(), "vec_id long, embedding array<double>"
    )
    refresh_generation(spark, root, corpus, **KW)
    assert tombstone_fraction(spark, root) == 0.0
    balanced = list_imbalance(spark, root)
    assert not needs_refresh(spark, root, threshold=balanced + 0.1)

    victims = spark.createDataFrame(
        [(v,) for v in range(10)], "vec_id long"
    )
    tombstone_ids(spark, root, victims)
    tombstone_ids(spark, root, victims)  # re-issue: distinct-counted
    frac = tombstone_fraction(spark, root)
    assert frac == pytest.approx(10 / 60)
    assert needs_refresh(
        spark, root, threshold=balanced + 0.1, tombstone_threshold=0.1
    )
    assert not needs_refresh(
        spark, root, threshold=balanced + 0.1, tombstone_threshold=0.5
    )
    assert not needs_refresh(
        spark, root, threshold=balanced + 0.1, tombstone_threshold=None
    )

    refresh_generation(spark, root, corpus, **KW)
    assert tombstone_fraction(spark, root) == 0.0
    assert not needs_refresh(
        spark, root, threshold=balanced + 0.1, tombstone_threshold=0.1
    )
