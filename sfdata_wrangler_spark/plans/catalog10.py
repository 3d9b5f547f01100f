"""Catalog wave 10 (round 3, queued for the round-4 driver sweep):
corpus-curation operators a 100 TB training-data pipeline needs
beyond the reference surface — repetition quality filters, per-domain
capping, PII scrubbing, and deterministic shard export. Registered
after the round-3 sweep front, so they rotate into the driver's
50-row window next round; until then `tools/check_oracle.py` is their
gate."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    pii_count,
    scrub_pii,
)
from ..operators.repetition import domain_cap, repetition_stats
from ..sources.shards import shard_id_sql, shard_manifest, write_shards
from .catalog import _register, _t
from .catalog_text import _NORM, norm_sql, tokcnt_sql


# Shared CTE chain ending in ``m`` (per-doc rounded repetition
# metrics); reused verbatim by the end-to-end pipeline oracle so both
# queries restate literally the same stage.
_REPETITION_M_CTES = f"""
WITH base AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS t
  FROM documents
  WHERE length({_NORM}) > 0
), toks AS (
  SELECT doc_id, unnest(t) AS tok FROM base
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
), td AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS tok_total,
         CAST(count(*) AS BIGINT) AS tok_distinct,
         CAST(max(c) AS BIGINT) AS tok_top
  FROM tc GROUP BY doc_id
), bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i + 1])) AS g
  FROM base WHERE len(t) >= 2
), gc AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
), gd AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS gram_total,
         CAST(count(*) AS BIGINT) AS gram_distinct
  FROM gc GROUP BY doc_id
), m AS (
  SELECT td.doc_id,
         tok_total AS n_tokens,
         round(tok_distinct / tok_total, 6) AS distinct_token_ratio,
         round(tok_top / tok_total, 6) AS top_token_frac,
         round(CASE WHEN gram_total IS NOT NULL
                    THEN 1.0 - gram_distinct / gram_total
                    ELSE 0.0 END, 6) AS dup_bigram_frac
  FROM td LEFT JOIN gd ON td.doc_id = gd.doc_id
)
"""

_KEEP_SQL = (
    "CAST(CASE WHEN top_token_frac <= 0.2"
    " AND distinct_token_ratio >= 0.3"
    " AND dup_bigram_frac <= 0.4"
    " THEN 1 ELSE 0 END AS INTEGER)"
)

_REPETITION_ORACLE = f"""
{_REPETITION_M_CTES}
SELECT CAST(doc_id AS BIGINT) AS doc_id, n_tokens,
       distinct_token_ratio, top_token_frac, dup_bigram_frac,
       {_KEEP_SQL} AS keep
FROM m
"""


@_register("txt_repetition_stats", _REPETITION_ORACLE, bench=True)
def txt_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter (operators/repetition.py): per
    document the type/token ratio, top-token share, duplicate-bigram
    fraction, and the composite keep decision. Scale shape: map-ONLY —
    every metric is a per-row array_sort + linear run-length fold in
    whole-stage codegen, zero shuffle (an ``exploded=True`` kernel
    exists for documents too big to hold as token arrays)."""
    docs = _t(spark, sf_dir, "documents")
    return repetition_stats(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "distinct_token_ratio",
        "top_token_frac",
        "dup_bigram_frac",
        "keep",
    )


@_register(
    "txt_domain_cap",
    """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(rk AS INTEGER) AS rk
    FROM r WHERE rk <= 15
    """,
)
def txt_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (operators/repetition.py:domain_cap):
    keep ≤15 docs per source in a deterministic md5-of-id order, so
    one crawl domain can't dominate the training mix and every engine
    reproduces the same sample. One window shuffle on the domain
    key."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    capped = domain_cap(docs, max_per_domain=15, rank_col="rk")
    return capped.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.col("rk").cast("int").alias("rk"),
    )


# Deterministic synthetic PII injection: the corpus text has no real
# emails/phones/IPs, so each doc gets a doc_id-keyed mix (some docs
# none, some several) and the scrubber must find exactly those.
_PII_TEXT_SQL = """(text
  || CASE WHEN doc_id % 3 = 0
          THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
          ELSE '' END
  || CASE WHEN doc_id % 7 = 0
          THEN ' cc admin' || CAST(doc_id % 100 AS VARCHAR) || '@mail.test.org'
          ELSE '' END
  || CASE WHEN doc_id % 5 <= 1
          THEN ' call +1 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END
  || CASE WHEN doc_id % 4 = 0
          THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
               || CAST((doc_id * 7) % 256 AS VARCHAR)
          ELSE '' END)"""

def _scrub_sql(col: str) -> str:
    """Oracle twin of functions/pii.scrub_pii (same patterns, same
    order, global flag)."""
    return (
        "regexp_replace(regexp_replace(regexp_replace(" + col + ","
        " '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),"
        " '\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}', '<PHONE>', 'g'),"
        " '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g')"
    )


_PII_ORACLE = f"""
WITH injected AS (
  SELECT doc_id, source, {_PII_TEXT_SQL} AS raw FROM documents
), scrubbed AS (
  SELECT doc_id, source, raw, {_scrub_sql("raw")} AS clean
  FROM injected
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum((length(clean) - length(replace(clean, '<EMAIL>', ''))) / 7)
            AS BIGINT) AS n_emails,
       CAST(sum((length(clean) - length(replace(clean, '<PHONE>', ''))) / 7)
            AS BIGINT) AS n_phones,
       CAST(sum((length(clean) - length(replace(clean, '<IP>', ''))) / 4)
            AS BIGINT) AS n_ips,
       CAST(sum(length(clean)) AS BIGINT) AS clean_chars
FROM scrubbed
GROUP BY source
"""


@_register("txt_pii_scrub", _PII_ORACLE)
def txt_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (functions/pii.py): emails, phones, and IPv4s
    replaced by placeholder tokens in one codegen-resident
    regexp_replace chain — no UDF, no shuffle until the final
    per-source rollup. The injection is deterministic per doc_id, so
    the oracle recomputes identical inputs and the redacted character
    totals are hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")

    def _opt(cond, *parts):
        return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))

    raw = F.concat(
        F.col("text"),
        _opt(did % 3 == 0, F.lit(" reach user"), did.cast("string"),
             F.lit("@example.com")),
        _opt(did % 7 == 0, F.lit(" cc admin"), (did % 100).cast("string"),
             F.lit("@mail.test.org")),
        _opt(did % 5 <= 1, F.lit(" call +1 415-555-"),
             F.lpad((did % 10000).cast("string"), 4, "0")),
        _opt(did % 4 == 0, F.lit(" from 10."), (did % 256).cast("string"),
             F.lit(".0."), ((did * 7) % 256).cast("string")),
    )
    clean = scrub_pii(raw)
    scrubbed = docs.select(F.col("source"), clean.alias("clean"))
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(pii_count(F.col("clean"), EMAIL_TOKEN)).cast("bigint").alias("n_emails"),
        F.sum(pii_count(F.col("clean"), PHONE_TOKEN)).cast("bigint").alias("n_phones"),
        F.sum(pii_count(F.col("clean"), IP_TOKEN)).cast("bigint").alias("n_ips"),
        F.sum(F.length("clean")).cast("bigint").alias("clean_chars"),
    )


@_register(
    "s12_shard_manifest",
    f"""
    SELECT {shard_id_sql('doc_id', 8)} AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(n_chars) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1
    """,
)
def s12_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard export (sources/shards.py): the
    corpus is written through ``write_shards`` — md5-prefix shard
    assignment, one hash shuffle, partitionBy(shard) parquet — then
    read back and rolled into the per-shard manifest a trainer plans
    epochs from. The oracle computes the same manifest directly from
    the source table, proving the export is lossless and the layout a
    pure function of doc ids."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    path = os.path.join(
        tempfile.gettempdir(),
        "sfdata_shard_export",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    write_shards(docs, path, n_shards=8)
    back = spark.read.parquet(path)
    return shard_manifest(back, token_col="n_chars").select(
        F.col("shard").cast("int").alias("shard"),
        "n_docs", "min_id", "max_id", "n_tokens",
    )


@_register(
    "emb_semdedup",
    """
    WITH base AS (
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             CAST(label AS BIGINT) AS label,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings
    ),
    twins AS (
      SELECT vec_id + 1000000 AS vec_id, label,
             list_transform(range(1, len(v) + 1),
                            i -> v[CAST(i AS INT)]
                                 + 0.01 * ((vec_id + i - 1) % 7 - 3)) AS v
      FROM base WHERE vec_id % 5 = 0
    ),
    corpus AS (
      SELECT vec_id, label, v FROM base
      UNION ALL SELECT vec_id, label, v FROM twins
    ),
    dup AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM corpus a JOIN corpus b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.9
    )
    SELECT c.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN c.vec_id ELSE 0 END)
                AS BIGINT) AS dropped_id_sum
    FROM corpus c LEFT JOIN dup d ON c.vec_id = d.vec_id
    GROUP BY c.label
    """,
    bench=True,
)
def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style per-cluster pruning (operators/similarity.py:
    semdedup_prune): within each label cluster, drop every vector with
    an earlier above-0.9-cosine neighbor. The raw synthetic corpus has
    no >= 0.9 pairs, so deterministic twins are seeded exactly as in
    dd_embedding_neardup (0.01 * ((vec_id + dim) % 7 - 3) per
    coordinate — IEEE-exact in both engines); the per-label rollup
    carries a dropped-id checksum so the oracle hash pins the exact
    kept set, not just counts."""
    from ..operators.similarity import semdedup_prune

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("label").cast("bigint").alias("label"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    twins = (
        base.where(F.col("vec_id") % 5 == 0)
        .select(
            "vec_id",
            "label",
            F.transform(
                "embedding",
                lambda x, i: x
                + F.lit(0.01)
                * ((F.col("vec_id") + i) % 7 - 3).cast("double"),
            ).alias("embedding"),
        )
        .select((F.col("vec_id") + 1000000).alias("vec_id"), "label",
                "embedding")
    )
    corpus = base.unionByName(twins)
    flagged = semdedup_prune(corpus, cluster_col="label", threshold=0.9)
    return flagged.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("dropped").cast("bigint").alias("n_dropped"),
        F.sum(F.col("dropped") * F.col("vec_id")).cast("bigint").alias(
            "dropped_id_sum"
        ),
    )


_V2_ORACLE = f"""
{_REPETITION_M_CTES},
kept AS (
  SELECT d.doc_id, d.source, d.text
  FROM m JOIN documents d USING (doc_id)
  WHERE {_KEEP_SQL} = 1
),
capped AS (
  SELECT * FROM (
    SELECT doc_id, source, text,
           row_number() OVER (
             PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
    FROM kept
  ) WHERE rk <= 12
),
scrubbed AS (
  SELECT doc_id, source, text,
         {_scrub_sql(_PII_TEXT_SQL)} AS clean
  FROM capped
),
deduped AS (
  SELECT * FROM (
    SELECT doc_id, clean,
           row_number() OVER (
             PARTITION BY md5({norm_sql('text')}) ORDER BY doc_id) AS rn
    FROM scrubbed
  ) WHERE rn = 1
)
SELECT {shard_id_sql('doc_id', 8)} AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum({tokcnt_sql('clean')}) AS BIGINT) AS total_tokens,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM deduped
GROUP BY 1
"""


@_register("pipe_curation_v2", _V2_ORACLE, bench=True)
def pipe_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation with the round-3 operator set, one lazy
    plan: repetition keep-filter (explode + combinable groupBys) →
    per-domain cap of 12 (md5-order window) → PII scrub over the
    deterministic injected text (codegen regex chain) → exact dedup on
    the normalized raw-text key (min-id row per group) → md5-prefix
    shard manifest with an id checksum. The oracle restates all five
    stages, so the composition — filter interplay, cap-after-filter
    ranks, scrub-before-dedup ordering — is value-checked end to
    end."""
    from ..functions.text import norm_key, token_count
    from ..operators.repetition import domain_cap, repetition_stats
    from ..sources.shards import shard_id
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    # exploded=True HERE (r14, guide §1.2/§7.2): with the per-row
    # kernel, pushing `keep == 1` down collapses the full run-length
    # aggregate expression into the scan Filter 6+ times per row
    # (higher-order lambdas get no codegen CSE), measured 2.06 s vs
    # 1.25 s for the exploded twin whose aggregation is an optimizer
    # barrier — the metrics evaluate once and the filter sees plain
    # columns. txt_repetition_stats keeps the per-row default: as an
    # OUTPUT (no filter collapse) it measures faster (0.86 vs
    # 1.10 s) and stays map-only. Both kernels are differentially
    # tested equal.
    keep_ids = (
        repetition_stats(docs, exploded=True)
        .where(F.col("keep") == 1)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"))
    )
    base = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source", "text"
    )
    kept = base.join(keep_ids, "doc_id")
    capped = domain_cap(kept, max_per_domain=12)

    did = F.col("doc_id")

    def _opt(cond, *parts):
        return F.when(cond, F.concat(*parts)).otherwise(F.lit(""))

    raw = F.concat(
        F.col("text"),
        _opt(did % 3 == 0, F.lit(" reach user"), did.cast("string"),
             F.lit("@example.com")),
        _opt(did % 7 == 0, F.lit(" cc admin"), (did % 100).cast("string"),
             F.lit("@mail.test.org")),
        _opt(did % 5 <= 1, F.lit(" call +1 415-555-"),
             F.lpad((did % 10000).cast("string"), 4, "0")),
        _opt(did % 4 == 0, F.lit(" from 10."), (did % 256).cast("string"),
             F.lit(".0."), ((did * 7) % 256).cast("string")),
    )
    scrubbed = capped.select(
        "doc_id", "source", "text", scrub_pii(raw).alias("clean")
    )
    wdup = Window.partitionBy(norm_key(F.col("text"))).orderBy("doc_id")
    deduped = (
        scrubbed.withColumn("rn", F.row_number().over(wdup))
        .where(F.col("rn") == 1)
    )
    return (
        deduped.select(
            shard_id(F.col("doc_id"), 8).alias("shard"),
            "doc_id",
            token_count(F.col("clean")).alias("n_tokens"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )
