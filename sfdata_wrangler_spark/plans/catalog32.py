"""Catalog wave 32 (round 4): standalone oracles for the operators
pre-built this round — sentence chunking, rolling z-score anomalies,
linkage blocking quality, and the per-slice classification report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _events, _register, _t

_SENT_SQL = """
    marked AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(
               replace(replace(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 chr(30), chr(30) || '0'),
                 chr(31), chr(30) || '1'),
               '\\.\\s+', '.' || chr(31), 'g'),
               '\\!\\s+', '!' || chr(31), 'g'),
               '\\?\\s+', '?' || chr(31), 'g') AS m
      FROM docs2
    ),
    sents AS (
      SELECT doc_id,
             generate_subscripts(string_split(m, chr(31)), 1) AS sidx,
             replace(replace(
               trim(unnest(string_split(m, chr(31)))),
               chr(30) || '1', chr(31)), chr(30) || '0', chr(30)) AS sentence
      FROM marked
    ),
    st AS (
      SELECT doc_id, sidx, sentence,
             CAST(len(string_split(sentence, ' ')) AS BIGINT) AS nt
      FROM sents WHERE length(sentence) > 0
    ),
    ck AS (
      SELECT doc_id, sidx, sentence, nt,
             (sum(nt) OVER (PARTITION BY doc_id ORDER BY sidx
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - nt) // 48 AS chunk_idx
      FROM st
    )
"""


@_register(
    "txt_sentence_chunks",
    f"""
    WITH docs2 AS (
      SELECT doc_id, text || '. ' || text || '.' AS text FROM documents
    ),
    {_SENT_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           string_agg(sentence, ' ' ORDER BY sidx) AS chunk_text
    FROM ck GROUP BY doc_id, chunk_idx
    """,
)
def txt_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aligned chunking standalone (operators/sentences.py):
    documents doubled with a period separator (the corpus text has no
    terminal punctuation of its own) → whole-sentence 48-token
    chunks by the order-free exclusive-prefix div rule."""
    from ..operators.sentences import sentence_chunks

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.concat(F.col("text"), F.lit(". "), F.col("text"), F.lit(".")).alias(
            "text"
        ),
    )
    return sentence_chunks(docs, budget=48)


@_register(
    "qc_rolling_zscore",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, value,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events WHERE user_id < 15
    ),
    w AS (
      SELECT user_id, event_id, value, v,
             CAST(count(v) OVER win AS BIGINT) AS n,
             CAST(coalesce(sum(v) OVER win, 0) AS BIGINT) AS s,
             CAST(coalesce(sum(v * v) OVER win, 0) AS BIGINT) AS ss
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, CAST(event_id AS BIGINT) AS event_id, value,
           CASE WHEN n >= 2 AND CAST(n * ss - s * s AS DOUBLE) > 0
                THEN CAST(n * v - s AS DOUBLE)
                     / sqrt(CAST(n * ss - s * s AS DOUBLE)
                            * CAST(n AS DOUBLE)
                            / (CAST(n AS DOUBLE) - 1.0))
           END AS z,
           CASE WHEN n >= 2 AND CAST(n * ss - s * s AS DOUBLE) > 0
                THEN coalesce(abs(CAST(n * v - s AS DOUBLE)
                     / sqrt(CAST(n * ss - s * s AS DOUBLE)
                            * CAST(n AS DOUBLE)
                            / (CAST(n AS DOUBLE) - 1.0))) > 3.0, FALSE)
                ELSE FALSE END AS alarm
    FROM w
    """,
)
def qc_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window point anomalies (operators/drift.
    rolling_zscore): self-excluded 20-observation baseline, exact
    BIGINT sufficient statistics, one fixed √/÷ tree — hash-exact
    down to the float z."""
    from ..operators.drift import rolling_zscore

    ev = _events(spark, sf_dir).where(F.col("user_id") < 15)
    out = rolling_zscore(
        ev, "user_id", "ts", "event_id", "value", window_n=20
    )
    return out.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        "value",
        "z",
        "alarm",
    )


@_register(
    "lk_blocking_quality",
    r"""
    WITH ents AS (
      SELECT DISTINCT trim(regexp_replace(lower(p_name), '\s+', ' ', 'g'))
               AS name
      FROM part WHERE p_partkey < 500
    ),
    blocked AS (
      SELECT name,
             CASE WHEN strpos(name, ' ') > 0
                  THEN regexp_extract(name, '([^ ]+)$', 1)
                  ELSE name END AS block
      FROM ents
    ),
    cands AS (
      SELECT a.name AS name_a, b.name AS name_b,
             levenshtein(a.name, b.name) AS dist
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    ),
    truth AS (
      SELECT a.name AS name_a, b.name AS name_b
      FROM ents a JOIN ents b ON a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ents),
    nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cands),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
    nf AS (
      SELECT CAST(count(*) AS BIGINT) AS n_truth_found
      FROM truth t
      WHERE EXISTS (SELECT 1 FROM cands c
                    WHERE c.name_a = t.name_a AND c.name_b = t.name_b)
    )
    SELECT n.n, nc.n_candidates, nt.n_truth, nf.n_truth_found,
           CASE WHEN n.n > 1
                THEN 1.0 - CAST(nc.n_candidates AS DOUBLE)
                     / CAST(n.n * (n.n - 1) / 2 AS DOUBLE) END
             AS reduction_ratio,
           CASE WHEN nt.n_truth > 0
                THEN CAST(nf.n_truth_found AS DOUBLE)
                     / CAST(nt.n_truth AS DOUBLE) END AS pair_completeness
    FROM n, nc, nt, nf
    """,
)
def lk_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality readout (operators/linkage.blocking_quality)
    on a 500-part name sample: candidates from the last-token
    blocked fuzzy join vs exact all-pairs ground truth (sample-sized,
    so the oracle CAN afford the quadratic truth) — reduction ratio
    and the recall the blocking traded for it."""
    from ..operators.linkage import blocked_fuzzy_pairs, blocking_quality

    from ..functions.text import normalize_text

    # normalize BEFORE building either side: blocked_fuzzy_pairs
    # normalizes its input internally, so the truth set must compare
    # the same canonical names (and the oracle does the same)
    ents = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_partkey") < 500)
        .select(normalize_text(F.col("p_name")).alias("name"))
        .distinct()
    )
    cands = blocked_fuzzy_pairs(ents, "name", max_distance=3)
    a = ents.select(F.col("name").alias("name_a"))
    b = ents.select(F.col("name").alias("name_b"))
    truth = (
        a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .where(F.levenshtein("name_a", "name_b") <= 3)
    )
    out = blocking_quality(ents, cands, truth)
    # the float ratios divide exact BIGINTs — but the sample's exact
    # division must match DuckDB's; single division each, fine
    return out


@_register(
    "qc_grouped_classification_report",
    """
    WITH s AS (
      SELECT o_orderstatus AS g,
             (o_orderkey % 1000) / 1000.0 AS score,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    cm AS (
      SELECT g,
             CAST(sum(CASE WHEN score >= 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN score >= 0.5 AND y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN score < 0.5 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN score < 0.5 AND y <> 1 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM s GROUP BY g
    )
    SELECT g, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END
             AS recall,
           CASE WHEN tp + fp + fn + tn > 0
                THEN CAST(tp + tn AS DOUBLE)
                     / CAST(tp + fp + fn + tn AS DOUBLE) END AS accuracy,
           CASE WHEN tp + fp + fn + tn > 0
                THEN CAST(tp + fp AS DOUBLE)
                     / CAST(tp + fp + fn + tn AS DOUBLE) END
             AS selection_rate
    FROM cm
    """,
)
def qc_grouped_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-slice scorer evaluation (operators/classifier.
    grouped_classification_report): the deterministic synthetic
    scorer sliced by order status — exact confusion cells plus the
    selection rate (disparate-impact numerator) per slice."""
    from ..operators.classifier import grouped_classification_report

    s = _t(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"),
        ((F.col("o_orderkey") % 1000) / 1000.0).alias("score"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .otherwise(0)
        .alias("y"),
    )
    return grouped_classification_report(s, ["g"])
