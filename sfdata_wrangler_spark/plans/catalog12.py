"""Catalog wave 12 (round 3, queued behind wave 11 for the driver
sweep rotation): the corpus-maintenance primitives — n-gram LM quality
scoring (CCNet's filter), line-level boilerplate removal (C4's
filter), and append-only incremental dedup against a persisted LSH
index (how a growing 100 TB corpus ingests new batches without
re-deduping itself)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_dedup, minhash_band_index
from ..operators.linedup import drop_boilerplate_lines
from ..operators.lm import bigram_lm_oracle_sql, bigram_lm_score
from .catalog import _register, _t
from .catalog_text import norm_sql

_NORM = norm_sql()


@_register("txt_lm_score", bigram_lm_oracle_sql(), bench=True)
def txt_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score per document (operators/lm.py):
    self-trained add-one-smoothed transition likelihood — counts are
    two map-side-combinable groupBys, scoring is one bigram-keyed
    equi-join, everything codegen (no ln/exp, integer micro-units, so
    the result is hash-exact against DuckDB)."""
    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_score(docs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_bigrams",
        "sum_p_micro",
        "mean_p_micro",
    )


# --- incremental dedup: new batch vs persisted band index ----------------

# Batch split: src0/src1 arrive "today"; the rest is the existing
# corpus whose band index is already persisted. ~10% of docs are
# near-dup clones (TESTDATA), so cross-batch collisions exist and the
# check is non-vacuous.
_NEW_SRCS = ("src0", "src1")
_N_MH = 8  # 8 md5 min-hashes, 4 bands of 2 — same scaffold as wave-8
_SHINGLES = (
    f"list_transform(range(1, greatest(len(string_split({_NORM}, ' ')) - 2, 0)"
    " + 1), i -> array_to_string(list_slice(string_split"
    f"({_NORM}, ' '), i, i + 2), ' '))"
)


def _sig_sql(pred: str) -> str:
    mins = ", ".join(
        f"min(md5('{i}|' || s)) AS mh_{i}" for i in range(_N_MH)
    )
    return (
        f"SELECT doc_id, {mins} FROM (SELECT doc_id, unnest({_SHINGLES}) AS s"
        f" FROM documents WHERE {pred}) GROUP BY doc_id"
    )


def _bands_sql(sig: str) -> str:
    return " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(mh_{2 * b} || '|' || mh_{2 * b + 1})"
        f" AS bh FROM {sig}"
        for b in range(_N_MH // 2)
    )


_NEW_PRED = "source IN ('" + "', '".join(_NEW_SRCS) + "')"
_DD_INCR_ORACLE = f"""
WITH sig_idx AS ({_sig_sql(f"NOT ({_NEW_PRED})")}),
sig_new AS ({_sig_sql(_NEW_PRED)}),
idx AS ({_bands_sql("sig_idx")}),
new_b AS ({_bands_sql("sig_new")}),
hits AS (
  SELECT n.doc_id,
         CAST(count(DISTINCT i.doc_id) AS BIGINT) AS n_index_hits,
         CAST(min(i.doc_id) AS BIGINT) AS first_hit_id
  FROM new_b n JOIN idx i ON n.band = i.band AND n.bh = i.bh
  GROUP BY n.doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(h.n_index_hits, 0) AS BIGINT) AS n_index_hits,
       h.first_hit_id,
       CAST(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE {_NEW_PRED}
"""


@_register("dd_incremental", _DD_INCR_ORACLE)
def dd_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-only ingestion dedup (operators/dedup.py): the existing
    corpus is represented ONLY by its LSH band index (the persisted
    lake artifact); the new batch's band hashes equi-join against it —
    O(batch) work per ingest, the existing corpus text is never
    re-read. md5 twin of the xxhash64 production path."""
    docs = _t(spark, sf_dir, "documents")
    is_new = F.col("source").isin(*_NEW_SRCS)
    index = minhash_band_index(
        docs.where(~is_new), num_hashes=_N_MH, bands=_N_MH // 2, hash_fn="md5"
    )
    out = incremental_dedup(
        index,
        docs.where(is_new),
        num_hashes=_N_MH,
        bands=_N_MH // 2,
        hash_fn="md5",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_index_hits",
        F.col("first_hit_id").cast("bigint").alias("first_hit_id"),
        F.col("is_new").cast("bigint").alias("is_new"),
    )


# --- line-level boilerplate removal --------------------------------------

# The documents table is single-line; derive a deterministic multiline
# corpus by folding each doc's tokens into 6-token lines (the token
# vocabulary is small, so many lines recur across docs — realistic
# boilerplate). Construction is posexplode + two grouped reassemblies:
# LINEAR in tokens (an explode over transform(sequence, slice) arrays
# re-evaluates the generator per row — the quadratic trap
# functions/text.word_shingles documents).
_LINE_W = 6
_LD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         generate_subscripts(string_split({_NORM}, ' '), 1) - 1 AS pos,
         unnest(string_split({_NORM}, ' ')) AS tok
  FROM documents
), linerows AS (
  SELECT doc_id, pos // {_LINE_W} AS line_no,
         string_agg(tok, ' ' ORDER BY pos) AS line
  FROM toks GROUP BY doc_id, pos // {_LINE_W}
), ml AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
  FROM linerows GROUP BY doc_id
), lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM ml
), freq AS (
  SELECT line, count(DISTINCT doc_id) AS nd FROM lines GROUP BY line
), kept AS (
  SELECT l.doc_id, l.pos, l.line
  FROM lines l JOIN freq f ON l.line = f.line WHERE f.nd < 2
), reasm AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM lines GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       t.n_lines,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       md5(coalesce(r.text, '')) AS clean_md5
FROM tot t LEFT JOIN reasm r ON t.doc_id = r.doc_id
"""


@_register("ld_boilerplate", _LD_ORACLE)
def ld_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate removal (operators/linedup.py):
    any line occurring in >= 2 distinct docs is dropped corpus-wide;
    docs are reassembled in order. Output carries md5 of the cleaned
    text so the full reconstruction is value-checked without shipping
    the text. The multiline fixture is built by the shuffle-free
    tokens_to_lines projection (oracle states the same lines via a
    position join — equality is part of what the hash check proves)."""
    from ..operators.linedup import tokens_to_lines

    docs = _t(spark, sf_dir, "documents")
    ml = docs.select(
        "doc_id", tokens_to_lines(F.col("text"), _LINE_W).alias("text")
    )
    out = drop_boilerplate_lines(ml, min_docs=2)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_lines",
        "n_kept",
        F.md5("text").alias("clean_md5"),
    )
