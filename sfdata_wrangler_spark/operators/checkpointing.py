"""Lineage-cut helper: localCheckpoint vs reliable checkpoint.

Multi-branch pipelines (pipe_curation_v3's 4-consumer `cleaned`
stage) cut lineage to stop N-way recomputation. Two Spark mechanisms
trade speed against fault tolerance:

- ``localCheckpoint``: blocks live on executor local disk/memory —
  fastest (no remote write), but a LOST EXECUTOR loses blocks and,
  because the lineage was truncated, the job cannot recompute them:
  it restarts. Right default for single-node/interactive runs.
- ``checkpoint()`` to reliable storage (HDFS/S3/NFS): one extra
  write+read of the stage through the checkpoint dir, but surviving
  executor loss — the job reads the checkpointed blocks back instead
  of restarting. Right choice for long multi-hour cluster jobs where
  a restart costs more than the extra I/O.

``cut_lineage`` keeps both behind one knob so pipelines don't
hard-code the trade:

- explicit ``reliable=`` argument wins;
- else env ``SFDW_RELIABLE_CHECKPOINT`` ("1"/"true" -> reliable);
- default: local.

Reliable mode needs a checkpoint dir: ``SFDW_CHECKPOINT_DIR`` if
set (point it at durable storage on a real cluster), else
``/tmp/sfdw_checkpoints`` (correct single-node default; NOT durable
across machines — set the env var in production).

Both paths are LAZY (eager=False): materialization happens on the
first action, so plan-only consumers (plan-shape tests,
tools/plan_digest.py) never trigger the pipeline job.

Measured A/B at sf0.1 (local[32], 3 runs, see ARCHITECTURE.md
round-7 notes): the reliable write through /tmp costs roughly one
extra stage of I/O on pipe_curation_v3; on a cluster the cost scales
with the checkpointed stage's size and the store's write throughput.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["cut_lineage"]


def _truthy(v: str | None) -> bool:
    return (v or "").strip().lower() in ("1", "true", "yes", "on")


def cut_lineage(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Cut ``df``'s lineage lazily; reliable or executor-local per the
    knob (see module docstring)."""
    if reliable is None:
        reliable = _truthy(os.environ.get("SFDW_RELIABLE_CHECKPOINT"))
    if not reliable:
        return df.localCheckpoint(eager=False)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(
            os.environ.get("SFDW_CHECKPOINT_DIR", "/tmp/sfdw_checkpoints")
        )
        # Spark never deletes reliable checkpoint data (and it is
        # unusable after the app exits), so when WE install the
        # default dir, remove this app's UUID subdir at interpreter
        # exit — otherwise every run leaks the full materialized
        # stage to /tmp. A user-provided SFDW_CHECKPOINT_DIR is left
        # alone: durable stores may have their own retention.
        if "SFDW_CHECKPOINT_DIR" not in os.environ:
            import atexit
            import shutil

            app_dir = sc._jsc.sc().getCheckpointDir().get()
            atexit.register(shutil.rmtree, app_dir, True)
    return df.checkpoint(eager=False)
