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

from pyspark.sql import DataFrame, Window
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


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    scale: int = 10**6,
) -> DataFrame:
    """Probability-proportional-to-size SYSTEMATIC sample of exactly
    ``k`` draws (with multiplicity): the survey-statistics sampler
    behind every transit/household expansion design — rows with
    twice the weight get twice the selection probability, and heavy
    rows (weight > sampling stride) are drawn multiple times, which
    is what keeps Horvitz-Thompson estimators unbiased.

    Construction (all exact BIGINT — reproducible across engines,
    partitionings and reruns, no RNG state):

    1. fixed-point weights ``w = round(weight·scale)``; rows with
       w ≤ 0 are excluded (they have zero selection probability);
    2. a deterministic pseudo-random total order by
       (md5-bucket, md5, id) and each row's EXCLUSIVE prefix sum
       ``before`` via a TWO-LEVEL scan — per-bucket window sums plus
       a broadcast bucket-offset dim (the packing.py idiom; no
       single-partition global window anywhere);
    3. stride = total div k, anchor u0 = stride div 2 (midpoint
       systematic); row hit count = |{i < k : before ≤ u0 + i·stride
       < before + w}| via integer ceil-div.

    Σ n_hits = k exactly (every selection point lands in exactly one
    row's interval) PROVIDED total fixed-point weight ≥ k; below that
    (sub-unit weights) the stride clamps to 1 and the sampler
    under-draws to `total` hits. Returns the selected rows +
    (n_hits, w).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.floor(F.col(weight_col) * scale + 0.5).cast("bigint")
    rows = (
        df.withColumn("__w", w)
        .where(F.col("__w") > 0)
        .withColumn("__key", F.md5(F.col(id_col).cast("string")))
        .withColumn(
            "__bkt", F.conv(F.substring("__key", 1, 2), 16, 10).cast("int")
        )
    )
    in_bucket = Window.partitionBy("__bkt").orderBy("__key", id_col)
    rows = rows.withColumn(
        "__before_in", F.sum("__w").over(in_bucket) - F.col("__w")
    )
    offsets = (
        rows.groupBy("__bkt")
        .agg(F.sum("__w").alias("__bw"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__bw").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("bigint"),
            ),
        )
    )
    total_df = rows.agg(F.sum("__w").cast("bigint").alias("__total"))
    joined = rows.join(
        F.broadcast(offsets.select("__bkt", "__offset")), "__bkt"
    ).crossJoin(F.broadcast(total_df))
    before = (F.col("__offset") + F.col("__before_in")).alias("__before")
    joined = joined.withColumn("__before", before)
    # stride >= 1 guard: with total < k fixed-point units (degenerate
    # sub-unit weights) a zero stride would NULL-poison every div;
    # clamped, the sampler under-draws to at most `total` hits, which
    # the docstring's Σ-hits contract excludes explicitly
    stride = F.greatest(
        F.expr("__total div CAST({} AS BIGINT)".format(k)),
        F.lit(1).cast("bigint"),
    )
    joined = joined.withColumn("__stride", stride).withColumn(
        "__u0", F.expr("__stride div 2")
    )
    # Spark's `div` truncates toward zero, so floor/ceil on signed
    # numerators need care:
    # i_min = max(0, ceil((before - u0)/stride)): the (a + b - 1)
    # div b form is exact wherever the max(0, ·) can bind it;
    # i_max = floor((before + w - 1 - u0)/stride): shift the
    # numerator by +stride (it is always > -stride since u0 < stride)
    # so the div sees a nonnegative value, then subtract 1.
    i_min = F.greatest(
        F.lit(0).cast("bigint"),
        F.expr("(__before - __u0 + __stride - 1) div __stride"),
    )
    i_max = F.least(
        F.lit(k - 1).cast("bigint"),
        F.expr("((__before + __w - 1 - __u0 + __stride) div __stride) - 1"),
    )
    hits = F.greatest(
        F.lit(0).cast("bigint"), i_max - i_min + F.lit(1)
    )
    out = joined.withColumn("n_hits", hits).where(F.col("n_hits") > 0)
    return out.select(
        *[c for c in df.columns],
        F.col("__w").alias("w"),
        "n_hits",
    )


def reservoir_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key_col: str,
) -> DataFrame:
    """Deterministic per-group reservoir: the ``k`` rows whose
    ``md5(key)`` fingerprints are smallest within each group — a
    uniform-without-replacement sample (a cryptographic hash of a
    unique key is exchangeable) with two properties an actual
    random-state reservoir lacks at 100 TB:

    - reproducible across engines, re-runs, partitionings, and
      cluster sizes (no RNG state, no row-arrival order);
    - MERGEABLE: this is the classic bottom-k (KMV) construction —
      the bottom-k of a union is the bottom-k of the shards'
      bottom-k's, so shard-level samples combine without resampling.

    One hash shuffle on the group key; the per-group sort is the
    window's local ORDER BY (no global sort). ``key_col`` must be
    unique per row (it is the tie-breaker and the hash input)."""
    fp = F.md5(F.col(key_col).cast("string"))
    rk = F.row_number().over(
        Window.partitionBy(*group_cols).orderBy(fp, F.col(key_col))
    )
    return df.withColumn("sample_rank", rk).where(F.col("sample_rank") <= k)
