"""Repetition / diversity quality signals for training-data curation.

Gopher-style repetition filters (beyond-reference surface; the
reference has no text-corpus tooling — BASELINE.json north star):
documents dominated by a few repeated tokens or duplicated n-grams
are low-quality for LM training and get filtered before tokenization.

Scale shape: one ``explode`` then two map-side-combinable
aggregations keyed on (doc_id, token) and doc_id. Token counts
partially aggregate inside each scan task before the shuffle, so the
shuffle volume is per-doc *distinct* tokens, not corpus tokens. No
UDFs, no per-doc quadratic array scans (an ``F.transform``-over-
``F.filter`` counting idiom would be O(tokens²) per document — wrong
at 10k-token web documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.metrics import portable_round
from ..functions.text import normalize_text, word_shingles


def _gram_stats(
    df: DataFrame, id_col: str, gram: F.Column, out_prefix: str
) -> DataFrame:
    """Per-document (total, distinct, top-frequency) over an exploded
    gram column — the one reusable kernel for both token- and
    n-gram-level repetition."""
    grams = df.select(F.col(id_col), F.explode(gram).alias("_g"))
    counts = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return counts.groupBy(id_col).agg(
        F.sum("_c").cast("bigint").alias(f"{out_prefix}_total"),
        F.count(F.lit(1)).cast("bigint").alias(f"{out_prefix}_distinct"),
        F.max("_c").cast("bigint").alias(f"{out_prefix}_top"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bigram_n: int = 2,
    max_top_token_frac: float = 0.2,
    min_distinct_token_ratio: float = 0.3,
    max_dup_bigram_frac: float = 0.4,
) -> DataFrame:
    """Per-document repetition metrics plus a keep/drop decision.

    Output columns (all deterministic, DuckDB-oracle-parity):
      - ``n_tokens``            whitespace tokens after normalization
      - ``distinct_token_ratio`` type/token ratio, rounded 6
      - ``top_token_frac``      most-frequent-token share, rounded 6
      - ``dup_bigram_frac``     1 - distinct/total word bigrams, rounded 6
      - ``keep``                1 iff every threshold passes

    Empty documents (0 tokens) are dropped from the result — they are
    handled by the length filters upstream, and every ratio here
    would be 0/0.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        word_shingles(F.col(text_col), bigram_n).alias("_grams"),
    ).where(F.length(F.array_join("_toks", "")) > 0)

    tok_stats = _gram_stats(base, id_col, F.col("_toks"), "tok")
    gram_stats = _gram_stats(
        base.where(F.size("_grams") > 0), id_col, F.col("_grams"), "gram"
    )

    joined = tok_stats.join(gram_stats, id_col, "left")
    ttr = portable_round(
        F.col("tok_distinct") / F.col("tok_total"), 6
    )
    top_frac = portable_round(F.col("tok_top") / F.col("tok_total"), 6)
    # single-token docs have no bigrams: duplication is 0 by definition
    dup_bigram = portable_round(
        F.when(
            F.col("gram_total").isNotNull(),
            1.0 - F.col("gram_distinct") / F.col("gram_total"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    out = joined.select(
        F.col(id_col),
        F.col("tok_total").alias("n_tokens"),
        ttr.alias("distinct_token_ratio"),
        top_frac.alias("top_token_frac"),
        dup_bigram.alias("dup_bigram_frac"),
    )
    keep = (
        (F.col("top_token_frac") <= max_top_token_frac)
        & (F.col("distinct_token_ratio") >= min_distinct_token_ratio)
        & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
    )
    return out.withColumn(
        "keep", F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("int")
    )


def domain_cap(
    df: DataFrame,
    max_per_domain: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    rank_col: str | None = None,
) -> DataFrame:
    """Per-domain document cap: keep at most ``max_per_domain`` docs
    per domain, chosen by a deterministic pseudo-random order (md5 of
    the id, id tie-break) so re-runs and engines agree. This is the
    standard web-corpus debiasing step (one crawl domain must not
    dominate the training mix).

    Scale: one window over (domain → md5 order). Domains are numerous
    and individually small, so the partition-by key spreads evenly —
    no skew salting needed unless one domain holds >1 task's worth of
    rows, in which case pre-filter that domain separately.
    """
    order_key = F.md5(F.col(id_col).cast("string"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(domain_col)
        .orderBy(order_key, F.col(id_col))
    )
    capped = df.withColumn("_rk", F.row_number().over(w)).where(
        F.col("_rk") <= max_per_domain
    )
    if rank_col is None:
        return capped.drop("_rk")
    return capped.withColumnRenamed("_rk", rank_col)
