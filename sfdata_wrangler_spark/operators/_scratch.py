"""Shared scratch-column namespace guard.

Operators that stage internal columns under a reserved prefix
(``__sb_`` in :func:`.windows.sessionize_bucketed`, ``__cw_`` in
``calc_weights(strategy="agg")``) must reject inputs that already use
the prefix — a colliding column would either make the join-back
ambiguous (AnalysisException deep in the plan) or be silently dropped
by the trailing ``drop``. One definition (code-review r12 #5: the two
inline copies had to stay behaviorally in sync by hand)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def reject_scratch_columns(df: DataFrame, prefix: str, what: str) -> None:
    """Raise ``ValueError`` if any input column starts with ``prefix``."""
    clash = [c for c in df.columns if c.startswith(prefix)]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with {what}'s "
            f"{prefix} scratch namespace"
        )
