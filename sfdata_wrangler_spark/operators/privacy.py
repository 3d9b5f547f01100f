"""Privacy risk measurement: k-anonymity and l-diversity.

The compliance preflight for releasing or training on user-derived
tables: an equivalence class is a group of rows sharing the same
QUASI-IDENTIFIER values (the columns an attacker can link from the
outside — zip, age band, segment). A dataset is k-anonymous when
every class has >= k rows, and l-diverse (w.r.t. a sensitive column)
when every class carries >= l distinct sensitive values — k-anonymity
alone fails when a class is homogeneous in the sensitive attribute
(the classic homogeneity attack).

Shapes: one groupBy on the quasi-identifiers (class-sized output),
then a class-size rollup — both map-side combinable; nothing here is
row-scale after the first aggregation, so the report costs one
shuffle at any corpus size.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["equivalence_classes", "k_anonymity_report"]


def equivalence_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per quasi-identifier class: ``n_rows`` (its k) and, when a
    sensitive column is named, ``n_sensitive`` (its l). The
    class-grain table every anonymity decision reads."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("bigint").alias("n_sensitive")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """ONE summary row: class counts, the minimum class size (the
    dataset's actual k), row/class counts violating the ``k``
    threshold, and — with a sensitive column — the same for
    ``l``-diversity. All exact BIGINTs; group-sized intermediate."""
    classes = equivalence_classes(df, quasi_cols, sensitive_col)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("n_rows").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("n_rows") < k, 1).otherwise(0))
        .cast("bigint")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("n_sensitive").cast("bigint").alias("min_l"),
            F.sum(F.when(F.col("n_sensitive") < l, 1).otherwise(0))
            .cast("bigint")
            .alias("n_classes_below_l"),
        ]
    return classes.agg(*aggs)
