"""Driver-sweep ordering: the driver verifies only the first 50
entries of ``queries()``, so every name without a green row in a
committed CORRECTNESS_r*.json (plus any newly registered query) must
precede the already-green backlog. The green set is read from the
driver's own reports, so the rotation is automatic across rounds."""

import json
import os

from sfdata_wrangler_spark.plans.catalog import (
    QUERIES,
    driver_green,
    oracle_sql_map,
    query_map,
    sweep_order,
)

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_green_set_reflects_committed_reports():
    green = driver_green()
    r02 = json.load(open(os.path.join(_ROOT, "CORRECTNESS_r02.json")))
    hash_green = {
        n for n, row in r02.items()
        if row.get("err") is None and row.get("hash_match")
    }
    assert hash_green <= green
    # rows-only entries count as swept ONLY while the query still has
    # no oracle; g5 gained a closed-form oracle after its r01/r02
    # rows-only rows, so it must rotate back in for a hash check
    assert "g5_mapmatch_toy" not in green
    assert QUERIES["g5_mapmatch_toy"]["oracle"]
    # a still-oracle-less query with a recorded row count stays green
    assert "txt_quality_distill" in green or (
        "txt_quality_distill" not in json.load(
            open(os.path.join(_ROOT, "CORRECTNESS_r01.json"))
        )
        and "txt_quality_distill" not in r02
    )


def test_unswept_names_lead_the_sweep():
    order = sweep_order()
    swept = driver_green()
    front = [n for n in order if n not in swept]
    assert order[: len(front)] == front
    # The driver verifies only the first 50: every slot must go to a
    # name without a green row. Non-green names beyond position 50
    # (late registrations) queue for the next round's rotation —
    # that's expected, not an error — but a runaway backlog would mean
    # queries are being added faster than they can ever get verified.
    capped = order[: min(50, len(front))]
    assert all(n not in swept for n in capped)
    # Three rounds of headroom: the round-3→4 driver cycle recorded
    # no CORRECTNESS_r03.json (nothing cleared while 47 queries
    # landed), so the backlog legitimately spans the missed sweep
    # plus two normal rounds. If this trips again with reports
    # landing every round, registration has genuinely outrun
    # verification — slow down.
    assert len(front) <= 3 * 50, (
        f"{len(front)} unswept queries: the backlog would need more than "
        "three full driver rounds (50-row cap each) to clear"
    )


def test_maps_follow_sweep_order():
    assert list(query_map()) == sweep_order()
    oracle_names = [n for n in sweep_order() if QUERIES[n]["oracle"]]
    assert list(oracle_sql_map()) == oracle_names


def test_all_declared_names_survive_reorder():
    assert sorted(query_map()) == sorted(QUERIES)
