"""Catalog wave 29 (round 4): ingest-robustness sources.

Two lakehouse realities every 100 TB pipeline hits that the clean
scan queries never exercise: rows that don't parse (route to a
quarantine table, never silently drop) and files whose schema
evolved mid-table (older files lack newer columns; the read must
unify, not fail). Both verified hash-exact — the quarantine against
the committed dirty fixture's closed-form restatement, the evolution
read against the generation split it was written from.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.quarantine import read_csv_with_quarantine
from .catalog import _register, _t
from .catalog_text import norm_sql

_DIRTY = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    "tests",
    "fixtures",
    "dirty_events.csv",
)
_DIRTY_SCHEMA = "event_id BIGINT, user_id BIGINT, amount DOUBLE, note STRING"


def _dirty_split(spark: SparkSession):
    return read_csv_with_quarantine(spark, _DIRTY, _DIRTY_SCHEMA)


@_register(
    "s16_csv_quarantine",
    """
    SELECT * FROM (VALUES
      (CAST(2 AS BIGINT), CAST(11 AS BIGINT), CAST(NULL AS DOUBLE),
       'bad-amount', '2,11,not_a_number,bad-amount'),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       CAST(NULL AS VARCHAR), 'broken line without commas'),
      (CAST(6 AS BIGINT), CAST(NULL AS BIGINT), CAST(1.0 AS DOUBLE),
       'bad-user', '6,fourteen,1.00,bad-user')
    ) AS t(event_id, user_id, amount, note, raw_record)
    """,
)
def s16_csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-record quarantine (sources/quarantine.py): PERMISSIVE
    ``from_csv`` over a text scan routes the committed dirty
    fixture's three malformed rows — type mismatch, arity mismatch,
    bad key — to the side table with their PARTIAL parses and raw
    text. The oracle restates the expected quarantine verbatim."""
    _, quar = _dirty_split(spark)
    return quar.select(
        "event_id", "user_id", "amount", "note", "raw_record"
    )


@_register(
    "s16_csv_quarantine_clean",
    """
    SELECT CAST(4 AS BIGINT) AS n_clean,
           CAST(16 AS BIGINT) AS sum_event_id,
           CAST(2350 AS BIGINT) AS sum_amount_cents
    """,
)
def s16_csv_quarantine_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clean side of the same scan: fully-typed rows only, with
    an exact-cents checksum proving no good row leaked into
    quarantine and no bad row leaked out."""
    clean, _ = _dirty_split(spark)
    return clean.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clean"),
        F.sum("event_id").cast("bigint").alias("sum_event_id"),
        F.sum(F.floor(F.col("amount") * 100 + 0.5))
        .cast("bigint")
        .alias("sum_amount_cents"),
    )


@_register(
    "s17_schema_evolution_read",
    """
    WITH m AS (
      SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS pm,
             CAST(count(*) AS BIGINT) AS n,
             CASE WHEN min(year(l_shipdate)) >= 1998
                  THEN CAST((floor((sum(CAST(floor((l_extendedprice) * 10000 + 0.5) AS BIGINT)) + 50) / 100.0) / 100.0) AS DOUBLE)
             END AS rev
      FROM lineitem
      WHERE year(l_shipdate) IN (1997, 1998)
      GROUP BY 1
    )
    SELECT pm, n, rev, (rev IS NULL) AS from_old_generation FROM m
    """,
)
def s17_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution lake read (S8's forward-compat half): an old
    generation of parquet files written WITHOUT the ``rev`` column
    and a new generation WITH it are read back as one table via
    ``mergeSchema`` — missing columns surface as nulls instead of a
    failed scan, which is how a 100 TB table adds a column without
    rewriting history. The null pattern itself is part of the
    hash-checked output."""
    from .catalog import _msum2

    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1997, 1998)
    ).withColumn("pm", F.date_format("l_shipdate", "yyyy-MM"))
    # per-PROCESS path: stable across repeated invocations in one
    # session (no unbounded /tmp growth under bench loops and sweeps)
    # while two concurrent sessions still never overwrite each other
    # mid-read (the race a fixed shared path had)
    path = os.path.join(
        tempfile.gettempdir(),
        f"sfdata_schema_evolution_{os.getpid()}",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    old = (
        li.where(F.year("l_shipdate") == 1997)
        .groupBy("pm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    new = (
        li.where(F.year("l_shipdate") == 1998)
        .groupBy("pm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            _msum2(F.col("l_extendedprice")).alias("rev"),
        )
    )
    old.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    new.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return merged.select(
        "pm",
        "n",
        "rev",
        F.col("rev").isNull().alias("from_old_generation"),
    )


@_register(
    "txt_chunk_windows",
    """
    WITH d AS (
      SELECT doc_id, string_split({norm}, ' ') AS t
      FROM documents
      WHERE {norm} <> ''
    ),
    s AS (
      SELECT doc_id, t,
             unnest(range(0,
               greatest(0, CAST(ceil((len(t) - 64) / 48.0) AS INT) * 48) + 1,
               48)) AS chunk_start
      FROM d
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_start / 48 AS INT) AS chunk_idx,
           CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(t[chunk_start + 1 : least(chunk_start + 64, len(t))])
                AS INT) AS n_chunk_tokens,
           array_to_string(
             t[chunk_start + 1 : least(chunk_start + 64, len(t))], ' ')
             AS chunk_text
    FROM s
    """.format(norm=norm_sql()),
    bench=True,
)
def txt_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/long-context chunking (operators/chunking.py): 64-token
    windows, stride 48 (overlapping context), shuffle-free per-row
    projection — start grid capped so the final window is the only
    possibly-short one and covered text is never re-emitted as a
    tail fragment."""
    from ..operators.chunking import chunk_token_windows

    docs = _t(spark, sf_dir, "documents")
    out = chunk_token_windows(docs, width=64, stride=48)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "chunk_idx",
        "chunk_start",
        "n_chunk_tokens",
        "chunk_text",
    )


def _thread_oracle() -> str:
    from .catalog import _SESSION_ORACLE_BODY

    return (
        _SESSION_ORACLE_BODY.replace(
            "SELECT user_id, event_id, ts, value,",
            "SELECT user_id, event_id, ts, value, event_type,",
            1,
        ).replace(
            "SELECT user_id, event_id, ts, value,\n",
            "SELECT user_id, event_id, ts, value, event_type,\n",
        )
        + """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_msgs,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS thread_text
    FROM s GROUP BY user_id, session_id
    """
    )


@_register("w22_thread_assembly", _thread_oracle())
def w22_thread_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation/thread assembly — the chat-training-data prep op:
    sessionize each user's event stream (the W4 kernel, 30-min gap),
    then concatenate each session's messages IN ORDER into one
    training example. Ordered concatenation is collect_list of
    (ts, event_id, payload) structs → array_sort → join: the struct
    prefix is a total order, so assembly is deterministic under any
    partitioning (no SQL ORDER BY inside Spark aggregates)."""
    from ..operators.windows import sessionize
    from .catalog import _events

    ev = _events(spark, sf_dir)
    s = sessionize(
        ev, ["user_id"], "ts", gap_minutes=30.0, order_cols=["ts", "event_id"]
    )
    assembled = s.groupBy(
        "user_id", F.col("SESSION_ID").alias("session_id")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_msgs"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.unix_micros("ts").alias("t"),
                            F.col("event_id").alias("i"),
                            F.col("event_type").alias("m"),
                        )
                    )
                ),
                lambda x: x["m"],
            ),
            " ",
        ).alias("thread_text"),
    )
    return assembled


_HTML_WRAP_SQL = """
      '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
      || '</title><style>p{margin:0}</style></head><body>'
      || '<nav><a href="/">home</a> <a href="/l">all docs</a></nav><p>'
      || text
      || '</p><script>var tracker = "<p>not text</p>";</script>'
      || '<div><a href="/m">more like this</a></div></body></html>'
"""

_HTML_STRIP_STAGES_SQL = """
    raw AS (
      SELECT doc_id, {wrap} AS html FROM documents
    ),
    stripped AS (
      SELECT doc_id, html,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(html,
                     '(?is)<(script|style)[^>]*>.*?</(script|style)>',
                     ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
               '\\s+', ' ', 'g')) AS clean_text,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   array_to_string(regexp_extract_all(
                     regexp_replace(html,
                       '(?is)<(script|style)[^>]*>.*?</(script|style)>',
                       ' ', 'g'),
                     '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '),
                   '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
               '\\s+', ' ', 'g')) AS anchor_text
      FROM raw
    )
""".format(wrap=_HTML_WRAP_SQL)


@_register(
    "txt_html_extract",
    f"""
    WITH {_HTML_STRIP_STAGES_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           clean_text,
           CAST(length(clean_text) AS BIGINT) AS n_chars,
           CASE WHEN length(clean_text) > 0
                THEN CAST(length(anchor_text) AS DOUBLE)
                     / CAST(length(clean_text) AS DOUBLE)
           END AS link_density
    FROM stripped
    """,
)
def txt_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction (functions/html.py): documents wrapped
    in a deterministic page shell (title, style, nav links, a script
    whose payload CONTAINS markup, footer link) are reduced back to
    text — script/style payloads dropped, tags stripped, entities
    decoded, whitespace collapsed — plus link density, the classic
    boilerplate-block signal. One shuffle-free regex projection; the
    oracle replays the identical chain (the regex subset where Java
    and RE2 agree)."""
    from ..functions.html import html_text_stats

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit('</title><style>p{margin:0}</style></head><body>'),
        F.lit('<nav><a href="/">home</a> <a href="/l">all docs</a></nav><p>'),
        F.col("text"),
        F.lit('</p><script>var tracker = "<p>not text</p>";</script>'),
        F.lit('<div><a href="/m">more like this</a></div></body></html>'),
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        *html_text_stats(html),
    )


@_register(
    "txt_url_normalize",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           'https://example' || CAST(doc_id % 7 AS VARCHAR)
             || '.com/Docs/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                     WHEN doc_id % 3 = 1 THEN '?z=9'
                     ELSE '' END AS canonical_url,
           'example' || CAST(doc_id % 7 AS VARCHAR) || '.com' AS host
    FROM documents
    """,
)
def txt_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (functions/url.py): deterministically
    messy crawl URLs — uppercase scheme/host, www prefix, default
    port, unsorted query with tracking params, fragment — reduce to
    the canonical dedup key. The oracle states the GROUND-TRUTH
    canonical form in closed form (not a regex replay), so it checks
    the semantics, not just cross-engine regex agreement. Shuffle-free
    projection."""
    from ..functions.url import normalize_url, url_host

    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?z=9&utm_campaign=x"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0, F.lit("#section")).otherwise(
            F.lit("")
        ),
    )
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        normalize_url(messy).alias("canonical_url"),
        url_host(messy).alias("host"),
    )
