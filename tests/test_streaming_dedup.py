"""Streaming exact dedup ≡ batch exact dedup (same normalized key),
through a real readStream → writeStream cycle."""

import datetime
import os

from pyspark.sql import Row


def _docs(spark):
    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [
        Row(doc_id=1, text="The cat sat.", ts=t0),
        Row(doc_id=2, text="the  CAT sat.", ts=t0 + datetime.timedelta(minutes=1)),  # dup of 1 (normalized)
        Row(doc_id=3, text="Entirely different.", ts=t0 + datetime.timedelta(minutes=2)),
        Row(doc_id=4, text="The cat sat.", ts=t0 + datetime.timedelta(minutes=3)),   # dup of 1
        Row(doc_id=5, text="Another doc.", ts=t0 + datetime.timedelta(minutes=4)),
    ]
    return spark.createDataFrame(rows)


def test_batch_mode_dedup(spark):
    from sfdata_wrangler_spark.streaming.dedup_stream import stream_dedup_exact

    out = stream_dedup_exact(_docs(spark))
    kept = sorted(r.text.lower().strip() for r in out.collect())
    assert len(kept) == 3  # one survivor per normalized key


def test_stream_dedup_matches_batch(spark, tmp_path):
    from sfdata_wrangler_spark.streaming.dedup_stream import stream_dedup_exact

    docs = _docs(spark)
    src = os.path.join(tmp_path, "src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_dedup_exact(stream, ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test").collect()
    batch = stream_dedup_exact(docs).collect()
    assert len(got) == len(batch) == 3
    # same normalized-key survivors (ids may differ: streaming keeps
    # arrival-order first, batch keeps an arbitrary-but-single row)
    def keys(rows):
        return sorted(" ".join(r.text.lower().split()) for r in rows)

    assert keys(got) == keys(batch)


def test_stream_neardup_matches_batch_incremental(spark, tmp_path):
    """foreachBatch near-dup vs the static band index: the union of
    per-batch accepted docs equals the batch incremental_dedup result
    on the same data."""
    from sfdata_wrangler_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_index,
    )
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        stream_incremental_neardup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "spark shuffles wide joins across the cluster nightly"),
        ],
        ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog again"),  # dup
            (102, "totally novel payload about glaciers and volcanoes"),
            (103, "spark shuffles wide joins across the cluster nightly"),  # dup
            (104, "another unseen document with fresh content entirely"),
        ],
        ["doc_id", "text"],
    )
    index = minhash_band_index(corpus).localCheckpoint(eager=True)

    src = os.path.join(tmp_path, "ndsrc")
    batch.write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    accepted = []

    def sink(df, batch_id):
        accepted.extend(r["doc_id"] for r in df.collect())

    q = (
        stream_incremental_neardup(stream, index, sink)
        .option("checkpointLocation", os.path.join(tmp_path, "ndckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    expected = {
        r["doc_id"]
        for r in incremental_dedup(index, batch).where("is_new").collect()
    }
    assert set(accepted) == expected == {102, 104}


def test_selfmaintaining_neardup_dedups_across_batches(spark, tmp_path):
    """The closed ingest loop: batch N must reject near-dups of docs
    ACCEPTED in batches 1..N-1 (not just of the seed corpus), and the
    stream must equal a sequential batch replay with the same batch
    boundaries."""
    import time

    from sfdata_wrangler_spark.operators.dedup import (
        incremental_dedup,
        minhash_band_index,
    )
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        stream_selfmaintaining_neardup,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    batches = [
        [
            (101, "the quick brown fox jumps over the lazy dog again"),  # dup of seed
            (102, "totally novel payload about glaciers and volcanoes"),
        ],
        [
            (201, "totally novel payload about glaciers and volcanoes"),  # dup of 102!
            (202, "another unseen document with fresh content entirely"),
        ],
        [
            (301, "another unseen document with fresh content entirely"),  # dup of 202!
            (302, "final wave of genuinely new text about tide pools"),
        ],
    ]

    src = os.path.join(tmp_path, "smsrc")
    os.makedirs(src)
    schema = "doc_id long, text string"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # file-source trigger order follows mtimes

    index_path = os.path.join(tmp_path, "smindex")
    minhash_band_index(corpus).write.parquet(index_path)

    accepted = []

    def sink(df, batch_id):
        accepted.extend(r["doc_id"] for r in df.collect())

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_selfmaintaining_neardup(stream, index_path, sink)
        .option("checkpointLocation", os.path.join(tmp_path, "smckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # cross-batch near-dups (201 of 102, 301 of 202) must be rejected:
    # exactly what the static-index variant cannot do
    assert sorted(accepted) == [101 + 1, 202, 302]

    # sequential batch replay with the same boundaries agrees
    replay_index = minhash_band_index(corpus)
    replay_accepted = []
    for rows in batches:
        b = spark.createDataFrame(rows, schema)
        flags = incremental_dedup(replay_index, b)
        new = b.join(flags.where("is_new").select("doc_id"), "doc_id")
        replay_accepted.extend(r["doc_id"] for r in new.collect())
        replay_index = replay_index.unionByName(
            minhash_band_index(new)
        ).localCheckpoint(eager=True)
    assert sorted(accepted) == sorted(replay_accepted)

    # and the on-disk index now carries bands for seed + all accepted
    # (read via the layout-aware reader: increments live under
    # _batches/, hidden from a plain root read)
    from sfdata_wrangler_spark.streaming.dedup_stream import read_band_index

    idx = read_band_index(spark, index_path)
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == {
        1, 102, 202, 302,
    }


def _run_sm_stream(spark, tmp_path, batches, corpus, **kw):
    """Shared harness: write batches as mtime-ordered files, seed the
    index, run the self-maintaining stream to completion; returns
    (accepted doc ids in arrival order, index_path, start_fn) where
    start_fn re-starts the same stream on the same checkpoint."""
    import time

    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        stream_selfmaintaining_neardup,
    )

    src = os.path.join(tmp_path, "smsrc2")
    os.makedirs(src, exist_ok=True)
    schema = "doc_id long, text string"
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    index_path = os.path.join(tmp_path, "smindex2")
    minhash_band_index(corpus).write.parquet(index_path)
    ckpt = os.path.join(tmp_path, "smckpt2")
    accepted = []

    def sink(df, batch_id):
        accepted.extend((batch_id, r["doc_id"]) for r in df.collect())

    def start():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_selfmaintaining_neardup(stream, index_path, sink, **kw)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    start()
    return accepted, index_path, ckpt, start


_SM_BATCHES = [
    [
        (101, "the quick brown fox jumps over the lazy dog again"),
        (102, "totally novel payload about glaciers and volcanoes"),
    ],
    [
        (201, "totally novel payload about glaciers and volcanoes"),
        (202, "another unseen document with fresh content entirely"),
    ],
    [
        (301, "another unseen document with fresh content entirely"),
        (302, "final wave of genuinely new text about tide pools"),
    ],
]


def test_selfmaintaining_replay_is_idempotent(spark, tmp_path):
    """ADVICE r8 #1 (the data-loss-on-restart shape): replay the LAST
    trigger — whose index append already landed — by deleting its
    commit marker and restarting on the same checkpoint. The replayed
    batch must NOT collide with its own band rows: the sink must see
    the same accepted docs again, and the index's distinct content
    must not change (a restarted writer has a fresh run token, so the
    replayed dir lands alongside the old one — duplicate band rows
    are the documented harmless case, not loss)."""
    from sfdata_wrangler_spark.streaming.dedup_stream import read_band_index

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    accepted, index_path, ckpt, start = _run_sm_stream(
        spark, tmp_path, _SM_BATCHES, corpus
    )
    assert sorted(d for _b, d in accepted) == [102, 202, 302]
    idx_before = sorted(
        map(tuple, read_band_index(spark, index_path).distinct().collect())
    )

    # simulate the at-least-once crash window: append + sink done,
    # checkpoint commit for batch 2 never landed
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")  # local-FS checksum twin
    if os.path.exists(crc):
        os.remove(crc)
    accepted.clear()
    start()
    # the replayed trigger re-emits ITS batch's accepted docs — before
    # the per-batch-dir exclusion they self-collided and vanished
    assert accepted == [(2, 302)]
    idx_after = sorted(
        map(tuple, read_band_index(spark, index_path).distinct().collect())
    )
    assert idx_after == idx_before


def test_selfmaintaining_compaction_preserves_search(spark, tmp_path):
    """compact_every folds batch dirs into a generation dir: accepted
    set and index CONTENT are unchanged vs the uncompacted run, and
    the number of batch dirs drops (VERDICT r8 gap #2)."""
    from sfdata_wrangler_spark.operators.dedup import incremental_dedup
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        _BATCHES_SUBDIR,
        read_band_index,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    accepted, index_path, _ckpt, _start = _run_sm_stream(
        spark, tmp_path, _SM_BATCHES, corpus, compact_every=2
    )
    assert sorted(d for _b, d in accepted) == [102, 202, 302]

    # content unchanged: every accepted doc's bands present exactly once
    idx = read_band_index(spark, index_path)
    assert {r["doc_id"] for r in idx.select("doc_id").distinct().collect()} == {
        1, 102, 202, 302,
    }
    assert idx.count() == idx.distinct().count()

    # structural: folded — fewer batch dirs than triggers
    bdir = os.path.join(index_path, _BATCHES_SUBDIR)
    dirs = [d for d in os.listdir(bdir) if d.startswith("batch_id=")]
    assert len(dirs) < len(_SM_BATCHES)
    # a tier-1 generation dir exists (g-<run>-<batch> key)
    assert any(d.split("=")[1].startswith("g-") for d in dirs)

    # search equivalence: a near-dup of an early accepted doc is
    # still rejected against the compacted index
    probe = spark.createDataFrame(
        [(901, "totally novel payload about glaciers and volcanoes")],
        ["doc_id", "text"],
    )
    flags = incremental_dedup(idx, probe)
    assert [r["is_new"] for r in flags.collect()] == [False]


def test_selfmaintaining_checkpoint_rotation_loses_nothing(spark, tmp_path):
    """code-review r9 #2 + pass-3 #2: re-running the stream against
    the SAME persistent index with a FRESH checkpoint restarts batch
    ids at 0. Run-token dir keys mean the old run's increment dirs
    are never overwritten, and the startup fold moves all but the
    highest-numbered trigger's dirs into a generation dir — so the
    index's distinct doc set is intact and re-fed docs are REJECTED
    as duplicates of the already-indexed corpus (the dedup gate's
    job). ADVICE r9 #3: the old run's highest-numbered (in-flight-
    candidate) dirs are folded too once the new run's first trigger
    commits, so NOTHING re-emits — the old blind window at that
    trigger number no longer recurs."""
    import time

    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        read_band_index,
        stream_selfmaintaining_neardup,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    src = os.path.join(tmp_path, "rotsrc")
    os.makedirs(src)
    schema = "doc_id long, text string"
    for rows in _SM_BATCHES:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    index_path = os.path.join(tmp_path, "rotindex")
    minhash_band_index(corpus).write.parquet(index_path)

    def run(ckpt_name, acc):
        def sink(df, batch_id):
            acc.extend(r["doc_id"] for r in df.collect())

        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_selfmaintaining_neardup(stream, index_path, sink)
            .option(
                "checkpointLocation", os.path.join(tmp_path, ckpt_name)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    first, second = [], []
    run("rotckpt_a", first)
    assert sorted(first) == [102, 202, 302]
    docs_before = {
        r["doc_id"]
        for r in read_band_index(spark, index_path)
        .select("doc_id").distinct().collect()
    }

    run("rotckpt_b", second)  # fresh checkpoint: batch ids restart at 0
    # ALL re-fed docs REJECTED as duplicates of the indexed corpus:
    # 302's old rows sit at the old in-flight trigger number and are
    # replay-excluded at the new trigger 0... but the tail fold after
    # the first commit makes them generation-visible before the new
    # trigger 2 re-feeds 302 (ADVICE r9 #3); no old index content
    # destroyed
    assert second == []
    docs_after = {
        r["doc_id"]
        for r in read_band_index(spark, index_path)
        .select("doc_id").distinct().collect()
    }
    assert docs_after == docs_before == {1, 102, 202, 302}


def test_selfmaintaining_replay_preserves_mutual_neardup_siblings(
    spark, tmp_path
):
    """code-review r9 pass-2 #1: a batch whose accepted docs are
    near-dups OF EACH OTHER (batch-internal dups are documented as
    unresolved — both pass) must survive a replay of that trigger:
    with only identity filtering each sibling would collide with the
    other's replayed band rows and the whole batch would vanish. The
    batch-number exclusion drops the first attempt's dir wholesale,
    so the accepted set recomputes identically."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    batches = [
        [(101, "totally novel payload about glaciers and volcanoes")],
        [
            # mutual near-dups, both new vs the index as of trigger 1
            (201, "twin documents that mirror each other almost fully"),
            (202, "twin documents that mirror each other almost fully"),
        ],
    ]
    accepted, index_path, ckpt, start = _run_sm_stream(
        spark, tmp_path, batches, corpus
    )
    assert sorted(d for _b, d in accepted) == [101, 201, 202]

    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    accepted.clear()
    start()
    # BOTH siblings re-emitted — neither killed by the other's rows
    assert sorted(accepted) == [(1, 201), (1, 202)]


def test_selfmaintaining_output_exactly_once_under_replay(
    spark, tmp_path
):
    """VERDICT r9 ask #3: with the batch-number-keyed overwrite sink,
    a mid-trigger kill (emission landed, checkpoint commit did not)
    replays the trigger into the SAME output dir — readers of the
    output lake see every accepted doc EXACTLY once, no duplicate
    emissions."""
    import time

    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        parquet_accepted_sink,
        stream_selfmaintaining_neardup,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again")],
        ["doc_id", "text"],
    )
    src = os.path.join(tmp_path, "eosrc")
    os.makedirs(src)
    schema = "doc_id long, text string"
    for rows in _SM_BATCHES:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    index_path = os.path.join(tmp_path, "eoindex")
    minhash_band_index(corpus).write.parquet(index_path)
    out_dir = os.path.join(tmp_path, "eoout")
    ckpt = os.path.join(tmp_path, "eockpt")

    def start():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_selfmaintaining_neardup(
                stream, index_path, parquet_accepted_sink(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    start()
    first = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).collect()
    )
    assert first == [102, 202, 302]

    # mid-trigger kill: batch 2's output dir is committed, the
    # checkpoint commit marker is not — the at-least-once window
    os.remove(os.path.join(ckpt, "commits", "2"))
    crc = os.path.join(ckpt, "commits", ".2.crc")
    if os.path.exists(crc):
        os.remove(crc)
    start()
    replayed = spark.read.parquet(out_dir)
    assert sorted(r["doc_id"] for r in replayed.collect()) == [
        102, 202, 302,
    ], "replay duplicated or dropped emissions"
    # and the replayed trigger's dir holds exactly its own docs
    b2 = spark.read.parquet(out_dir + "/batch_no=2")
    assert [r["doc_id"] for r in b2.collect()] == [302]


def test_startup_fold_is_per_run_token(spark, tmp_path):
    """code-review r10 #1: replay candidacy is per run token. An
    older rotation's higher-numbered leftover (tok1-5) must NOT cause
    a younger run's in-flight dir (tok2-0) to be laundered into a
    generation — tok2-0 is the only replay target of a resume of
    run 2's checkpoint, and folding it would make the replayed docs
    self-collide."""
    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        _BATCHES_SUBDIR,
        _startup_fold_dirs,
    )

    index_path = os.path.join(tmp_path, "ptindex")
    bdir = os.path.join(index_path, _BATCHES_SUBDIR)
    minhash_band_index(
        spark.createDataFrame(
            [(1, "the seed corpus document")], "doc_id long, text string"
        )
    ).write.parquet(index_path)

    def _bands(doc_id, text):
        return minhash_band_index(
            spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
        )

    # dead run 1: committed triggers 4 and in-flight 5
    _bands(11, "first run committed doc").write.parquet(
        bdir + "/batch_id=tok1-4"
    )
    _bands(12, "first run in flight doc").write.parquet(
        bdir + "/batch_id=tok1-5"
    )
    # dead run 2 (rotation): in-flight trigger 0 only
    _bands(21, "second run in flight doc").write.parquet(
        bdir + "/batch_id=tok2-0"
    )

    tail = _startup_fold_dirs(spark, bdir, "tok3")
    # per-token maxima stay plain (replay candidates of THEIR run)...
    assert set(tail) == {"tok1-5", "tok2-0"}
    dirs = {d.split("=")[1] for d in os.listdir(bdir) if "=" in d}
    assert "tok1-5" in dirs and "tok2-0" in dirs
    # ...and only genuinely committed lower-numbered dirs were folded
    assert "tok1-4" not in dirs
    assert any(d.startswith("g-init-tok3") for d in dirs)


def test_compaction_levels_are_geometric(spark, tmp_path):
    """Round-10 generalization of the r9 two-tier fold: N dirs at a
    level fold into ONE dir at the next level, so every band row is
    re-read at most once per level promotion (O(T·log T) lifetime
    I/O) and content is preserved through the cascade."""
    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        _BATCHES_SUBDIR,
        _compact_batches,
        _gen_level,
        read_band_index,
    )

    assert _gen_level("tok-7") == 0
    assert _gen_level("g-tok-7") == 1          # legacy tier 1
    assert _gen_level("h-tok-7") == 2          # legacy tier 2
    assert _gen_level("g-init-tok") == 1
    assert _gen_level("g-L3-tok-7") == 3

    index_path = os.path.join(tmp_path, "geoindex")
    bdir = os.path.join(index_path, _BATCHES_SUBDIR)
    minhash_band_index(
        spark.createDataFrame(
            [(1, "the seed corpus document")], "doc_id long, text string"
        )
    ).write.parquet(index_path)

    def _write(doc_id, key):
        minhash_band_index(
            spark.createDataFrame(
                [(doc_id, f"wholly unique payload number {doc_id}")],
                "doc_id long, text string",
            )
        ).write.parquet(bdir + f"/batch_id={key}")

    # 2 plain dirs + trigger 2's fold → one g-L1; repeat → two g-L1;
    # the next fold cascades them into g-L2 within one call
    all_docs = {1}
    n = 0
    for cycle in range(3):
        for _ in range(2):
            _write(100 + n, f"tok-{n}")
            all_docs.add(100 + n)
            n += 1
        _compact_batches(spark, bdir, f"tok-{90 + cycle}", 2)

    keys = {d.split("=")[1] for d in os.listdir(bdir) if "=" in d}
    assert any(k.startswith("g-L2-") for k in keys), keys
    assert sum(1 for k in keys if _gen_level(k) == 1) < 2
    # no plain dirs left behind (none matched a current trigger no)
    assert not any(_gen_level(k) == 0 for k in keys), keys
    # content preserved exactly through the cascade
    docs = {
        r["doc_id"]
        for r in read_band_index(spark, index_path)
        .select("doc_id").distinct().collect()
    }
    assert docs == all_docs


def test_compaction_never_folds_stashed_replay_tails(spark, tmp_path):
    """code-review r10 pass-3 #2: the end-of-trigger plain fold must
    not launder OTHER runs' stashed replay-candidate tail dirs into a
    generation before this run's first trigger commits — only
    _fold_tail (after a second distinct batch id) may fold them."""
    from sfdata_wrangler_spark.operators.dedup import minhash_band_index
    from sfdata_wrangler_spark.streaming.dedup_stream import (
        _BATCHES_SUBDIR,
        _compact_batches,
        _startup_fold_dirs,
    )

    index_path = os.path.join(tmp_path, "tlindex")
    bdir = os.path.join(index_path, _BATCHES_SUBDIR)
    minhash_band_index(
        spark.createDataFrame(
            [(1, "the seed corpus document")], "doc_id long, text string"
        )
    ).write.parquet(index_path)

    def _write(doc_id, key):
        minhash_band_index(
            spark.createDataFrame(
                [(doc_id, f"unique tail payload {doc_id}")],
                "doc_id long, text string",
            )
        ).write.parquet(bdir + f"/batch_id={key}")

    _write(11, "tok1-5")   # dead run 1's in-flight trigger
    _write(21, "tok2-3")   # dead run 2's in-flight trigger

    tail = _startup_fold_dirs(spark, bdir, "tok4")
    assert set(tail) == {"tok1-5", "tok2-3"}
    # the new run commits its own trigger 0, then compacts at trigger
    # 1 with an aggressive cadence (compact_every=1): its own plain
    # dir folds, but the stashed tails are excluded — they remain
    # PLAIN and batch-number-excludable for a legal resume of their
    # checkpoints
    _write(31, "tok4-0")
    _compact_batches(
        spark, bdir, "tok4-1", 1, exclude_keys=frozenset(tail)
    )
    keys = {d.split("=")[1] for d in os.listdir(bdir) if "=" in d}
    assert "tok1-5" in keys and "tok2-3" in keys, keys
    assert "tok4-0" not in keys  # this run's committed dir DID fold
    assert any(k.startswith("g-L1-tok4-1") for k in keys), keys
