"""Temperature-weighted mixture sampling for training-data curation.

Beyond-reference surface: when assembling a multi-source/multi-
language training mix, sampling each stratum proportional to
``n^alpha`` (alpha < 1) up-weights small strata and flattens dominant
ones — the standard "temperature" mixing rule (alpha = 0.5 here, so
the per-stratum keep rate is ``C / sqrt(n)``: a stratum 100× larger
contributes only 10× the documents).

Scale shape: one map-side-combinable count per stratum (tiny result,
broadcast back), then a stateless per-row keep decision — no global
shuffle of the corpus, no RNG state. The keep decision is an md5-hex
prefix threshold (the same idiom as stratified sampling): a document
is kept iff the first 8 hex chars of ``md5(id)`` fall below
``floor(rate · 2^32)`` rendered in hex. Reproducible across engines,
re-runs, partitionings, and cluster sizes — which is what makes a
100 TB training mix auditable.

Determinism: ``rate = least(1, C / sqrt(n))`` uses only IEEE-exact
ops (sqrt and divide are correctly rounded in every engine), and the
hex threshold comparison is pure string ordering over lowercase hex.
There is deliberately NO cross-stratum normalization term (which
would need an order-sensitive float sum over strata); the budget
constant ``C`` plays that role and is chosen by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temperature_sample(
    df: DataFrame,
    stratum_col: str,
    budget_c: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability
    ``min(1, budget_c / sqrt(n_s))``, decided by a deterministic hash
    of ``id_col``.

    Returns the kept rows with ``n_stratum`` (stratum size) and
    ``rate_micro`` (the applied rate in integer micro-units) attached
    for audit.
    """
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_stratum")
    )
    rate = F.least(
        F.lit(1.0),
        F.lit(budget_c) / F.sqrt(F.col("n_stratum").cast("double")),
    )
    # floor(rate · 2^32) in 8 lowercase hex chars; rate == 1 keeps all
    thr_int = F.floor(rate * F.lit(4294967296.0)).cast("bigint")
    rates = counts.select(
        F.col(stratum_col),
        F.col("n_stratum"),
        rate.alias("_rate"),
        F.lpad(F.lower(F.hex(thr_int)), 8, "0").alias("_thr_hex"),
    )
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where((F.col("_rate") >= 1.0) | (bucket < F.col("_thr_hex")))
        .withColumn(
            "rate_micro",
            F.floor(F.col("_rate") * F.lit(1e6) + F.lit(0.5)).cast("bigint"),
        )
        .drop("_rate", "_thr_hex")
    )


def temperature_sample_oracle_sql(
    stratum_col: str,
    budget_c: float,
    select_cols: str,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`temperature_sample`: same counts, same
    rate formula, same hex-threshold keep rule."""
    return f"""
    WITH c AS (
      SELECT {stratum_col},
             CAST(count(*) AS BIGINT) AS n_stratum,
             least(1.0, {budget_c!r} / sqrt(CAST(count(*) AS DOUBLE))) AS rate
      FROM {table} GROUP BY {stratum_col}
    ), r AS (
      SELECT {stratum_col}, n_stratum, rate,
             lpad(lower(hex(CAST(floor(rate * 4294967296.0) AS BIGINT))),
                  8, '0') AS thr_hex
      FROM c
    )
    SELECT {select_cols},
           n_stratum,
           CAST(floor(rate * 1000000.0 + 0.5) AS BIGINT) AS rate_micro
    FROM {table} t JOIN r USING ({stratum_col})
    WHERE rate >= 1.0
       OR substring(md5(CAST(t.{id_col} AS VARCHAR)), 1, 8) < thr_hex
    """
