#!/usr/bin/env python
"""Regenerate SWEEP_FRESHNESS.json — the staleness manifest behind
``plans.catalog.sweep_order()``'s green-name rotation.

With the never-swept backlog at zero, all 50 driver sweep slots are
re-verification; the rotation should spend them on green names whose
IMPLEMENTING FILES changed after their last sweep (a green row from
round N says nothing about code committed in round N+1). The driver
runs in a vanilla session where shelling out to git is fragile, so
the git facts are precomputed here and committed:

- ``files``: every tracked ``sfdata_wrangler_spark/**/*.py`` ->
  unix time of its last commit (dirty working-tree files bumped to
  "now" so just-edited code counts as changed before it's committed);
- ``reports``: every CORRECTNESS_r*.json -> its commit time (the
  moment that round's sweep results became the record).

Run before the round's final commit (one `git log --name-only` pass;
idempotent). catalog.sweep_order() falls back to oldest-sweep-first
if the manifest is missing or stale-schema.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    log = subprocess.check_output(
        ["git", "log", "--format=\x01%ct", "--name-only"],
        cwd=ROOT,
        text=True,
    )
    files: dict[str, int] = {}
    reports: dict[str, int] = {}
    ts = 0
    for line in log.splitlines():
        if line.startswith("\x01"):
            ts = int(line[1:])
            continue
        path = line.strip()
        if not path:
            continue
        # log is newest-first: first sighting of a path IS its last
        # modification
        if (
            path.startswith("sfdata_wrangler_spark/")
            and path.endswith(".py")
            and path not in files
            and os.path.exists(os.path.join(ROOT, path))
        ):
            files[path] = ts
        elif (
            path.startswith("CORRECTNESS_r")
            and path.endswith(".json")
            and path not in reports
            and os.path.exists(os.path.join(ROOT, path))
        ):
            reports[path] = ts

    # uncommitted edits: newer than anything committed
    dirty = subprocess.check_output(
        ["git", "status", "--porcelain"], cwd=ROOT, text=True
    )
    now = int(time.time())
    for line in dirty.splitlines():
        path = line[3:].strip().split(" -> ")[-1]
        if path.startswith("sfdata_wrangler_spark/") and path.endswith(".py"):
            files[path] = now

    out = {"files": files, "reports": reports}
    with open(os.path.join(ROOT, "SWEEP_FRESHNESS.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"SWEEP_FRESHNESS.json: {len(files)} package files, "
        f"{len(reports)} driver reports"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
