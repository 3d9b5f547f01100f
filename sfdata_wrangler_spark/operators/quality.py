"""Declarative runtime data-quality checks (SURVEY.md §5).

The reference embeds QC as scattered filters, asserts, and printouts
(count bounds ``SFMuniDataHelper.py:491-497``, negative-service-mile
assertion ``GTFSHelper.py:516-519``, missing-route reports
``:593-615``, report-level error metrics ``TransitReporter.py:
152-153``). Here: one declarative check runner — each check is a
boolean Column; ALL checks evaluate in a single pass over the data
(one job, conditional-count aggregation), producing a violations
summary DataFrame you can gate a pipeline on or sink to a QC table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    predicate: Column  # True = row PASSES
    severity: str = "error"  # error | warn


def run_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """One aggregation pass → (check, severity, n_rows, n_violations,
    violation_rate). Fully lazy: a single agg over the data unpivoted
    with ``stack`` — no action runs until the caller executes the
    returned DataFrame, so it composes into larger plans for free."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(checks):
        aggs.append(
            F.coalesce(
                F.sum(F.when(~c.predicate, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v_{i}")
        )
    summary = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c.name}', '{c.severity}', `__v_{i}`"
        for i, c in enumerate(checks)
    )
    return summary.select(
        F.expr(
            f"stack({len(checks)}, {stack_args}) "
            "as (check, severity, n_violations)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "check",
        "severity",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        F.when(F.col("n_rows") == 0, F.lit(0.0))
        .otherwise(F.col("n_violations") / F.col("n_rows"))
        .cast("double")
        .alias("violation_rate"),
    )


def assert_checks(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """Raise if any error-severity check has violations; returns the
    summary either way (the reference's assert-with-print pattern,
    GTFSHelper.py:516-519)."""
    summary = run_checks(df, checks)
    bad = [
        r
        for r in summary.collect()
        if r.severity == "error" and r.n_violations > 0
    ]
    if bad:
        details = "; ".join(
            f"{r.check}: {r.n_violations}/{r.n_rows}" for r in bad
        )
        raise AssertionError(f"data-quality violations: {details}")
    return summary


# canonical transit checks (reference parity)
def avl_checks() -> list[Check]:
    return [
        Check("revenue_service_dir", F.col("DIR") < 2),
        Check("qc_count_bound", F.col("QC201") <= 20),
        Check("route_positive", F.col("ROUTE_AVL") > 0),
        Check("servmiles_nonnegative", F.col("SERVMILES") >= 0),
        Check(
            "load_identity",
            F.col("LOAD_ARR") == F.col("LOAD_DEP") - F.col("ON") + F.col("OFF"),
        ),
        Check("on_nonnegative", F.col("ON") >= 0, severity="warn"),
    ]


def fk_integrity(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
) -> DataFrame:
    """Referential-integrity report for a foreign key: per distinct
    child-key value that has NO matching parent row, the orphaned row
    count — plus NULL-key rows reported under a NULL key.

    Shape: distinct child keys (map-side combinable) anti-joined
    against distinct parent keys — both sides collapse to key
    cardinality before any join, so a billion-row fact against a
    million-row dimension joins at dimension scale. An empty result
    IS the integrity proof. The row-level repair (quarantine or drop)
    is then one broadcast semi/anti join with this key list.
    """
    pk = parent_key or child_key
    child_counts = child.groupBy(
        F.col(child_key).alias("orphan_key")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    parent_keys = parent.select(
        F.col(pk).alias("orphan_key")
    ).where(F.col(pk).isNotNull()).distinct()
    return child_counts.join(
        parent_keys, "orphan_key", "left_anti"
    ).orderBy(F.col("n_rows").desc(), F.col("orphan_key"))
