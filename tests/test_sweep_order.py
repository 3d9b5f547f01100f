"""Driver-sweep ordering: the driver verifies only the first 50
entries of ``queries()``, so every name never swept in round 2 (plus
any newly registered query) must precede the already-green backlog."""

from sfdata_wrangler_spark.plans.catalog import (
    QUERIES,
    SWEPT_R02,
    oracle_sql_map,
    query_map,
    sweep_order,
)


def test_unswept_names_lead_the_sweep():
    order = sweep_order()
    front = [n for n in order if n not in SWEPT_R02]
    assert order[: len(front)] == front
    # every never-swept / new query fits inside the driver's 50-row cap
    assert len(front) <= 50, (
        f"{len(front)} unswept queries exceed the driver's 50-row sweep cap; "
        "rotate some into SWEPT_R02 after they go green"
    )


def test_maps_follow_sweep_order():
    assert list(query_map()) == sweep_order()
    oracle_names = [n for n in sweep_order() if QUERIES[n]["oracle"]]
    assert list(oracle_sql_map()) == oracle_names


def test_all_declared_names_survive_reorder():
    assert sorted(query_map()) == sorted(QUERIES)
