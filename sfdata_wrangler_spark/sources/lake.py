"""Parquet-lake layout helpers (S8, SURVEY.md §2.1).

The reference's HDF5 stores (one file per year, one table key per
month, ``data_columns`` indexes; ``SFMuniDataHelper.py:28-39,535``)
become a partitioned Parquet lake: ``partitionBy("YEAR","MONTH")``
gives partition pruning, and Parquet min/max stats give the
predicate pushdown its ``store.select(where=...)`` relied on.
Idempotent re-runs use dynamic partition overwrite (the reference's
append+dedup dance)."""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("YEAR", "MONTH"),
    mode: str = "overwrite",
    dynamic: bool = True,
    cluster: bool = False,
) -> None:
    """Write a table partitioned for pruning. ``dynamic=True`` +
    mode=overwrite replaces only the partitions present in ``df`` —
    the scale-safe idempotent incremental load.

    ``cluster=True`` hash-repartitions on the partition columns first
    (guide §6: the Iceberg ``write.distribution-mode=hash`` trade —
    one shuffle of the written rows buys dir-sized output files).
    Without it every upstream task writes a file into every partition
    dir it holds rows for — tasks × partitions small files (measured
    r14 on the IVF-PQ code lake: 318 files → 10, write 1.68 s →
    1.28 s, and every later scan of the lake opens 30x fewer
    footers). Off by default: appends of already-clustered streams
    and single-partition writes shouldn't pay the extra exchange."""
    if cluster:
        df = df.repartition(*[F.col(c) for c in partition_cols])
    writer = df.write.mode(mode)
    if dynamic and mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table for co-located joins: two tables
    bucketed the same way join WITHOUT a shuffle (verified in
    tests/test_skew_bucketing.py by plan inspection). This is the
    100 TB answer for repeated fact⨝fact joins on the same key
    (schedule⨝observation on trip-stop keys).

    Idempotent across sessions: a warehouse directory left by a
    previous Spark session (whose in-memory catalog is gone) would
    make ``saveAsTable`` raise LOCATION_ALREADY_EXISTS, so any
    orphaned location is cleared first."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    orphan = os.path.join(warehouse, table.lower())
    if os.path.isdir(orphan):
        shutil.rmtree(orphan, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def with_year_month(df: DataFrame, date_col: str) -> DataFrame:
    """Derive the standard partition columns from a date/timestamp."""
    return df.withColumn("YEAR", F.year(date_col)).withColumn(
        "MONTH", F.month(date_col)
    )


def scan_file_metrics(df: DataFrame) -> dict:
    """Execute ``df`` and report what its file scan actually touched:
    ``{"num_files", "num_partitions", "rows"}``.

    The measured half of every partition-pruning claim: Spark's
    ``inputFiles()`` lists the relation's files BEFORE pruning (a
    filtered read reports the full file set), so the only honest
    numbers are the FileSourceScan's own execution metrics. Collects
    the frame to run it — meant for scan-shaped frames at test scale,
    not for production fact tables."""
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    leaves = plan.collectLeaves()
    out = {"num_files": 0, "num_partitions": 0, "rows": len(rows)}
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if "FileSourceScan" not in node.getClass().getName():
            continue
        m = node.metrics()
        out["num_files"] += int(m.apply("numFiles").value())
        if m.contains("numPartitions"):
            out["num_partitions"] += int(m.apply("numPartitions").value())
    return out


def compact_partitions(
    path: str,
    spark,
    partition_cols: Sequence[str] = ("YEAR", "MONTH"),
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Compact a partitioned parquet table's small files in place.

    Incremental micro-batch loads leave each partition littered with
    per-trigger files; at 100 TB the resulting scan-task explosion
    (one task per tiny file) and listing pressure dominate query
    latency. Compaction = read → one write task per partition value →
    ``maxRecordsPerFile`` splits oversized partitions into
    ~``target_file_bytes`` files → dynamic-overwrite replaces ONLY the
    partitions present (idempotent; untouched partitions keep their
    files). Rows-per-file is derived from the table's measured
    on-disk bytes/row, so wide and narrow tables both land near the
    target size.

    Parallelism note: ``repartition(partition_cols)`` gives one task
    per partition VALUE — compaction parallelism is across
    partitions, which is the right trade for a maintenance job (the
    file-splitting inside a task is writer-level, not a shuffle).
    Returns ``{"files_before", "files_after"}`` for telemetry.
    """
    import glob as _glob

    def _files() -> list:
        return _glob.glob(
            os.path.join(path, "**", "*.parquet"), recursive=True
        )

    before = _files()
    total_bytes = sum(os.path.getsize(f) for f in before)
    df = spark.read.parquet(path)
    n_rows = df.count()
    if n_rows == 0 or total_bytes == 0:
        return {"files_before": len(before), "files_after": len(before)}
    rows_per_file = max(1, int(n_rows * target_file_bytes / total_bytes))
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", rows_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    return {"files_before": len(before), "files_after": len(_files())}


_SCRATCH_CLEANUP_REGISTERED: set[str] = set()


def session_scratch(spark, *parts: str) -> str:
    """A session-scoped scratch directory for derived lake artifacts
    (IVF-PQ code lakes, persisted index parts): ``<repo>/.scratch/
    <spark application id>/<parts...>``.

    Fixes ADVICE r8 #2: the old fixed path under tempfile.gettempdir()
    was world-shared (squattable on a multi-user host) and raced when
    two sweeps/bench runs wrote the same sf concurrently. The app-id
    key guarantees single-writer per path (one SparkContext = one
    writer); the repo-owned parent removes the /tmp trust problem.
    Artifacts amortize across calls WITHIN a session — the serving
    regime bench measures — and the whole app dir is removed at
    interpreter exit (atexit, same device as the r7 checkpoint
    cleanup) so repeated sessions do not accrete."""
    import atexit
    import time

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    scratch_root = os.path.join(repo_root, ".scratch")
    app_dir = os.path.join(scratch_root, spark.sparkContext.applicationId)
    if app_dir not in _SCRATCH_CLEANUP_REGISTERED:
        _SCRATCH_CLEANUP_REGISTERED.add(app_dir)
        atexit.register(shutil.rmtree, app_dir, ignore_errors=True)
        # atexit never fires for OOM-killed/SIGKILLed sessions
        # (code-review r9 #4): sweep stale sibling app dirs on first
        # use. Liveness is POSITIVE, not pure age (ADVICE r9 #1: a
        # long-running sibling that only READS its cached path for
        # > 6h — e.g. a serve loop — must not lose its code lake
        # mid-read): each app dir records its owning PID in
        # `.owner_pid`, and the sweep skips any dir whose recorded
        # PID is still alive, no matter how old. Age (> 6h untouched)
        # remains the gate for dirs with a dead/unreadable PID file —
        # a recycled PID can at worst DELAY a sweep by one 6h window,
        # never delete a live session's dir, which is the right
        # asymmetry for a destructive sweep.
        cutoff = time.time() - 6 * 3600
        try:
            for entry in os.listdir(scratch_root):
                p = os.path.join(scratch_root, entry)
                if p == app_dir or os.path.getmtime(p) >= cutoff:
                    continue
                if _owner_alive(p):
                    continue
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    # app_dir itself must exist even for a no-parts call (dirname of
    # a bare app_dir path is scratch_root — code-review r9 pass-3 #3)
    path = os.path.join(app_dir, *parts)
    os.makedirs(app_dir, exist_ok=True)
    if parts:
        os.makedirs(os.path.dirname(path), exist_ok=True)
    pid_file = os.path.join(app_dir, ".owner_pid")
    if not os.path.exists(pid_file):
        # `.`-prefixed so iter_committed_files never counts it as data
        with open(pid_file, "w") as fh:
            fh.write(str(os.getpid()))
    os.utime(app_dir)  # age signal for dead-PID dirs in the sweep
    return path


def _owner_alive(app_dir: str) -> bool:
    """True iff ``app_dir``'s recorded owner PID is a live process.
    Missing/unreadable PID file → not alive (age alone governs)."""
    try:
        with open(os.path.join(app_dir, ".owner_pid")) as fh:
            pid = int(fh.read().strip())
        os.kill(pid, 0)
        return True
    except PermissionError:
        # EPERM = alive but owned by another user; on a shared
        # scratch root that IS the live-sibling case — deletion is
        # the unrecoverable direction, so err toward alive
        return True
    except (OSError, ValueError):
        return False


def atomic_write_text(spark, path: str, text: str) -> None:
    """Atomically (re)place a small control file — write to a hidden
    sibling temp name, then rename onto ``path``. The rename return
    value is CHECKED (Hadoop fs.rename reports failure as False, not
    an exception — the r9 compactor lesson). THE commit primitive for
    pipeline step markers and ANN generation pointers: readers see
    either the old content or the new, never a torn write."""
    import uuid

    fs, hpath, jvm = hadoop_fs(spark, path)
    parent = hpath.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    tmp = jvm.org.apache.hadoop.fs.Path(
        parent, f".tmp-{hpath.getName()}-{uuid.uuid4().hex[:8]}"
    )
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text, "utf-8"))
    finally:
        out.close()
    # rename FIRST: on POSIX-backed local filesystems Hadoop's rename
    # replaces the destination atomically, so readers never observe a
    # missing file (code-review r10 #2: delete-then-rename opened a
    # no-pointer window, and a crash between the two lost the old
    # content outright). Filesystems that refuse to rename onto an
    # existing path (HDFS) fall back to delete+rename — there the
    # window is real but small, and a crash inside it leaves the OLD
    # artifacts intact plus a recoverable temp file, never a torn
    # write.
    # bounded retry around the fallback: two CONCURRENT writers can
    # interleave exactly so that each delete is followed by the
    # other's rename landing first, failing both of a single-shot
    # delete+rename pair (observed by the r13 tombstone-mid-rotation
    # chaos test: two activates racing the _current pointer). These
    # are last-writer-wins control files, so retrying until one value
    # lands is correct; after the attempts the loud torn-state error
    # below still fires, with the new content preserved at the temp
    # path for manual re-commit.
    import time as _time

    def _dest_holds_intended() -> bool:
        # ADVICE r13 #3: each delete+failed-rename lap re-opens a
        # readers-see-no-pointer window and can discard a concurrent
        # writer's just-committed value. Before deleting (again),
        # check whether the destination ALREADY carries the content
        # we were asked to commit — ours, or an identical concurrent
        # writer's (the common chaos-test collision: two activates of
        # the same generation). Then this write is a no-op success
        # and the destination is never touched.
        try:
            ins = fs.open(hpath)
        except Exception:
            return False
        try:
            buf = bytearray()
            b = ins.read()
            while b != -1:
                buf.append(b)
                b = ins.read()
        finally:
            ins.close()
        return buf.decode("utf-8") == text

    for attempt in range(4):
        if fs.rename(tmp, hpath):
            return
        if fs.exists(hpath):
            if _dest_holds_intended():
                fs.delete(tmp, False)
                return
            fs.delete(hpath, False)
        if fs.rename(tmp, hpath):
            return
        _time.sleep(0.01 * (attempt + 1))
    raise IOError(
        f"atomic text rename failed for {path}; new content "
        f"preserved at {tmp}"
    )


def read_text(spark, path: str) -> str | None:
    """Contents of a small control file, or None if absent. Reads
    byte-at-a-time through py4j — fine for the ~100-byte pointer and
    marker files this pairs with (:func:`atomic_write_text`), wrong
    for anything bigger."""
    import time

    fs, hpath, _jvm = hadoop_fs(spark, path)
    for attempt in (0, 1):
        if not fs.exists(hpath):
            # exists-false may be the MIDDLE of a delete+rename
            # replacement (the HDFS fallback path of
            # atomic_write_text) — retry once before concluding the
            # file is genuinely absent (code-review r10 pass-2 #5)
            if attempt:
                return None
            time.sleep(0.05)
            continue
        try:
            ins = fs.open(hpath)
        except Exception:
            # exists→open race against the same replacement window:
            # one retry lands after the rename completes
            if attempt:
                raise
            continue
        try:
            buf = bytearray()
            b = ins.read()
            while b != -1:
                buf.append(b)
                b = ins.read()
        finally:
            ins.close()
        return buf.decode("utf-8")
    return None


def scratch_tag_for_path(path: str) -> str:
    """A collision-safe scratch-dir tag for a source path:
    ``<basename>-<md5(fullpath)[:8]>``. Basename alone aliases two
    same-named dirs onto one scratch lake (code-review r10 #7); one
    definition here so every session_scratch caller keys the same
    way (code-review r10 pass-2 #9)."""
    import hashlib

    norm = os.path.normpath(path)
    return (
        f"{os.path.basename(norm)}-"
        f"{hashlib.md5(norm.encode()).hexdigest()[:8]}"
    )


def has_committed_data(spark, path: str) -> bool:
    """True iff ``path`` holds at least one COMMITTED data file.
    Directory existence is not enough: a concurrent writer's job
    setup creates the dir (plus _temporary/) seconds before any
    parquet footer commits, and an aborted first write leaves it
    existing-but-empty forever — reading either state throws
    (code-review r9 pass-5 #2). THE readiness probe shared by the
    IVF-PQ serve path and the pipeline runner's step-skip check."""
    fs, hpath, _jvm = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return False
    return next(iter_committed_files(fs, hpath), None) is not None


def hadoop_fs(spark, path: str):
    """(FileSystem, Path, jvm) for ``path`` — scheme-agnostic (local
    in tests, HDFS/S3A in production). THE shared handle derivation
    (code-review r9 pass-7 #4): the streaming dedup compactor and the
    IVF-PQ serve readiness probe both build on this one."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def iter_committed_files(fs, hpath):
    """Yield the Hadoop ``LocatedFileStatus`` of every COMMITTED data
    file under ``hpath``: a file counts only if NO path component
    BELOW the root is hidden (``_``/``.`` prefixed). Filtering the
    leaf name alone is wrong — ``listFiles(path, recursive)`` descends
    into ``_temporary/``, whose in-flight task-attempt part files have
    perfectly ordinary leaf names (code-review r9 pass-6 #1: that
    window is exactly the concurrent-first-write race readiness guards
    exist for). Components are checked by WALKING PARENTS toward the
    lake root (not string-prefix stripping — pass-7 #2): the walk
    stops at the first hidden component (excluded) or at the matched
    root (included), so a lake legitimately living under a hidden
    ancestor (``<repo>/.scratch/...``) is read correctly whenever the
    root matches — and listing results come from the same FileSystem
    as ``makeQualified``, so it does.
    ``hpath`` naming a single FILE yields that file if its own name is
    non-hidden (a plain-parquet-file lake is readable — pass-7 #1).
    One definition shared by the IVF-PQ serve readiness check and the
    streaming band-index compactor so the committed-file notion
    cannot drift."""
    base = fs.makeQualified(hpath).toUri().getPath().rstrip("/")
    if fs.getFileStatus(hpath).isFile():
        if not hpath.getName().startswith(("_", ".")):
            yield fs.listFiles(hpath, False).next()
        return
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        hidden = False
        matched = False
        while p is not None:
            if p.toUri().getPath().rstrip("/") == base:
                matched = True
                break
            if p.getName().startswith(("_", ".")):
                hidden = True
                break
            p = p.getParent()
        if matched or not hidden:
            yield st
