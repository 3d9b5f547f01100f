"""HTML → text extraction (web-corpus ingest surface).

The step every web-scale corpus pipeline runs between the crawl and
the text operators: strip markup, drop script/style payloads, decode
entities, and measure link density (the classic boilerplate signal —
navigation/footer blocks are link-dense, article bodies are not;
Kohlschütter et al., WSDM 2010).

Everything is a chain of ``regexp_replace`` / ``regexp_extract_all``
column expressions — JVM-side, codegen'd, shuffle-free, and written
against the regex subset where Java (Spark) and RE2 (DuckDB)
semantics agree (no backrefs, no lookahead), so the extraction is
oracle-checkable. A full HTML5 parser this is not (malformed-tag
recovery, CDATA edge cases); it is the deterministic 95% that turns
a WET/WARC payload into text for the downstream quality/dedup
operators, with the remaining 5% quarantined by those operators'
own stats.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: entity → character, applied in fixed order (amp LAST on decode so
#: double-encoded text decodes one level per pass, not two)
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_SCRIPT_STYLE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
_TAG = r"<[^>]*>"
_ANCHOR = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"


def strip_tags(col: Column) -> Column:
    """Markup → text: remove script/style WITH their payloads, drop
    every remaining tag, decode the common entities, collapse
    whitespace runs, trim."""
    out = F.regexp_replace(col, _SCRIPT_STYLE, " ")
    out = F.regexp_replace(out, _TAG, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def link_density(col: Column) -> Column:
    """Fraction of extracted text characters that live inside <a>
    tags — the boilerplate-block signal. Computed as
    len(strip(anchor texts)) / len(strip(document)); documents whose
    stripped text is empty report NULL. Anchors are extracted AFTER
    script/style removal, so anchor markup inside JS strings never
    counts (and density stays ≤ 1)."""
    clean = strip_tags(col)
    no_scripts = F.regexp_replace(col, _SCRIPT_STYLE, " ")
    anchor_text = strip_tags(
        F.array_join(
            F.regexp_extract_all(no_scripts, F.lit(_ANCHOR), 1), " "
        )
    )
    return F.when(
        F.length(clean) > 0,
        F.length(anchor_text).cast("double")
        / F.length(clean).cast("double"),
    )


def html_text_stats(col: Column) -> list[Column]:
    """(clean_text, n_chars, link_density) for an HTML column — the
    single-pass projection the ingest query uses."""
    clean = strip_tags(col)
    no_scripts = F.regexp_replace(col, _SCRIPT_STYLE, " ")
    anchor_text = strip_tags(
        F.array_join(
            F.regexp_extract_all(no_scripts, F.lit(_ANCHOR), 1), " "
        )
    )
    dens = F.when(
        F.length(clean) > 0,
        F.length(anchor_text).cast("double")
        / F.length(clean).cast("double"),
    )
    return [
        clean.alias("clean_text"),
        F.length(clean).cast("bigint").alias("n_chars"),
        dens.alias("link_density"),
    ]
