"""Catalog wave 31 (round 4): the web-corpus curation tier, composed.

pipe_curation (v1-v3) covered clean-text curation; v4 is the tier
BEFORE it — what a crawl needs between WARC payloads and the text
operators: markup → text extraction with a link-density boilerplate
gate, canonical-URL deduplication, and sentence-aligned chunking.
One lazy plan, every stage restated in the oracle so the interplay
(density computed on EXTRACTED text, dedup on canonical not raw
URLs, chunking after both gates) is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import _register, _t

# --- deterministic crawl shell: page markup + messy URL per doc.
# docs where doc_id % 4 == 0 carry a 12-link nav spam block, so the
# link-density gate has real positives whose fate is closed-form.

_SPAM_LINKS = "".join(
    f'<a href="/s{i}">sponsored listing {i}</a> ' for i in range(12)
)

_HTML_SQL = (
    "'<html><head><title>D' || CAST(doc_id AS VARCHAR) || "
    "'</title><style>a{{color:blue}}</style></head><body>'"
    " || CASE WHEN doc_id % 4 = 0 THEN '<div>{spam}</div>' ELSE '' END"
    " || '<p>' || text || '. ' || text || '.</p>'"
    " || '<script>var u = \"<a href=x>fake</a>\";</script>'"
    " || '</body></html>'"
).format(spam=_SPAM_LINKS.replace("'", "''"))

_URL_SQL = (
    "'HTTP://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)"
    " || '.NET:80/Page/' || CAST(doc_id % 97 AS VARCHAR)"
    " || '?utm_source=crawl&ref=bot#top'"
)

_STRIP = """trim(regexp_replace(
               replace(replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace({src},
                     '(?is)<(script|style)[^>]*>.*?</(script|style)>',
                     ' ', 'g'),
                   '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
               '\\s+', ' ', 'g'))"""

_ANCHOR_SRC = (
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # array_join([]) is '' — a no-anchor page must score density 0,
    # not NULL-out of the gate
    "coalesce(array_to_string(regexp_extract_all(regexp_replace(html, "
    "'(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'), "
    "'(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '')"
)
_ANCHOR_STRIP = _STRIP.format(src=_ANCHOR_SRC)

_V4_ORACLE = f"""
WITH raw AS (
  SELECT doc_id, {_HTML_SQL} AS html FROM documents
),
ex AS (
  SELECT doc_id,
         {_STRIP.format(src="html")} AS clean_text,
         {_ANCHOR_STRIP}
           AS anchor_text
  FROM raw
),
gated AS (
  SELECT doc_id, clean_text
  FROM ex
  WHERE length(clean_text) > 0
    AND CAST(length(anchor_text) AS DOUBLE)
        / CAST(length(clean_text) AS DOUBLE) < 0.5
),
canon AS (
  SELECT doc_id, clean_text,
         'http://site' || CAST(doc_id % 7 AS VARCHAR)
           || '.net/Page/' || CAST(doc_id % 97 AS VARCHAR) AS url,
         'site' || CAST(doc_id % 7 AS VARCHAR) || '.net' AS host
  FROM gated
),
dedup AS (
  SELECT doc_id, clean_text, host
  FROM (SELECT *, row_number() OVER (PARTITION BY url
                                     ORDER BY doc_id) AS rn
        FROM canon)
  WHERE rn = 1
),
marked AS (
  SELECT doc_id, host,
         regexp_replace(regexp_replace(regexp_replace(
           replace(replace(
             trim(regexp_replace(lower(clean_text), '\\s+', ' ', 'g')),
             chr(30), chr(30) || '0'),
             chr(31), chr(30) || '1'),
           '\\.\\s+', '.' || chr(31), 'g'),
           '\\!\\s+', '!' || chr(31), 'g'),
           '\\?\\s+', '?' || chr(31), 'g') AS m
  FROM dedup
),
sents AS (
  SELECT doc_id, host,
         generate_subscripts(string_split(m, chr(31)), 1) AS sidx,
         replace(replace(
           trim(unnest(string_split(m, chr(31)))),
           chr(30) || '1', chr(31)), chr(30) || '0', chr(30)) AS sentence
  FROM marked
),
st AS (
  SELECT doc_id, host, sidx, sentence,
         CAST(len(string_split(sentence, ' ')) AS BIGINT) AS nt
  FROM sents WHERE length(sentence) > 0
),
ck AS (
  SELECT doc_id, host, nt,
         (sum(nt) OVER (PARTITION BY doc_id ORDER BY sidx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - nt) // 64 AS chunk_idx
  FROM st
),
per_chunk AS (
  SELECT doc_id, host, chunk_idx,
         CAST(sum(nt) AS BIGINT) AS chunk_tokens
  FROM ck GROUP BY doc_id, host, chunk_idx
)
SELECT host,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(doc_id * (chunk_idx + 1)) AS BIGINT) AS id_checksum
FROM per_chunk GROUP BY host
"""


@_register("pipe_curation_v4", _V4_ORACLE, bench=True)
def pipe_curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-tier curation end to end: deterministic page shells (a
    quarter carry a 12-link spam block; every script payload contains
    markup) → HTML text extraction → link-density gate (< 0.5 on
    EXTRACTED text) → canonical-URL dedup (scheme/host case, default
    port, tracking params, fragment all collapse; min doc_id wins) →
    sentence-aligned 64-token chunking → per-host panel. One lazy
    plan; the oracle restates every stage."""
    from ..functions.html import html_text_stats
    from ..functions.url import normalize_url, url_host
    from ..operators.sentences import sentence_chunks

    docs = _t(spark, sf_dir, "documents")
    spam = F.lit("<div>" + _SPAM_LINKS + "</div>")
    html = F.concat(
        F.lit("<html><head><title>D"),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>a{color:blue}</style></head><body>"),
        F.when(F.col("doc_id") % 4 == 0, spam).otherwise(F.lit("")),
        F.lit("<p>"),
        F.col("text"),
        F.lit(". "),
        F.col("text"),
        F.lit('.</p><script>var u = "<a href=x>fake</a>";</script>'),
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("HTTP://WWW.Site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".NET:80/Page/"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("?utm_source=crawl&ref=bot#top"),
    )
    ex = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        url.alias("url"),
        *html_text_stats(html),
    )
    # lineage cut BEFORE the gate (r14, guide §1.2/§7.2): pushing the
    # density predicate into the scan inlines the 4-regex strip chain
    # 5x per row (the gate references clean/anchor lengths, and
    # FilterExec conditions get no codegen subexpression
    # elimination), plus once more in the surviving Project — six
    # chain evaluations where two suffice. Materializing `ex` (one
    # doc-sized row of extracted text + two lengths) evaluates the
    # chains once; the gate then filters plain columns. Measured
    # noop-sink A/B at sf0.1: 1.65-1.86 s -> 1.03-1.14 s, outputs
    # identical. Same localCheckpoint-vs-recompute trade v3's
    # `cleaned` cut documents (cut_lineage keeps the reliable-
    # checkpoint knob for cluster mode).
    from ..operators.checkpointing import cut_lineage

    ex = cut_lineage(ex)
    gated = ex.where(
        (F.col("n_chars") > 0) & (F.col("link_density") < 0.5)
    )
    canon = gated.select(
        "doc_id",
        F.col("clean_text").alias("text"),
        normalize_url(F.col("url")).alias("curl"),
        url_host(F.col("url")).alias("host"),
    )
    w = Window.partitionBy("curl").orderBy("doc_id")
    dedup = (
        canon.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "curl")
    )
    # host rides through the chunker (functionally dependent on
    # doc_id) — a join back to `dedup` would re-run the whole
    # extract/gate/dedup subtree a second time
    chunks = sentence_chunks(dedup, budget=64, carry_cols=["host"])
    return chunks.groupBy("host").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.col("doc_id") * (F.col("chunk_idx") + 1))
        .cast("bigint")
        .alias("id_checksum"),
    )
