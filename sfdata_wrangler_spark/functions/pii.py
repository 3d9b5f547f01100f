"""PII detection / redaction for training-data curation.

Beyond-reference surface (BASELINE.json north star): corpus pipelines
scrub emails, phone numbers, and IP addresses before training. All
pure Column expressions (regexp_replace chains) so redaction runs
inside whole-stage codegen — no UDFs, linear scan, no shuffle.

Dialect parity: the patterns below restrict themselves to the regex
subset Java (Spark) and the oracle engine interpret identically —
explicit character classes, ``{m,n}`` bounds, no lookaround, no
shorthand classes like ``\\d`` (DuckDB/RE2 and Java agree on them,
but explicit classes remove all doubt).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters: emails first (their local part would otherwise be
# clipped by the phone pattern's digit runs), then phones, then IPs.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"

_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, EMAIL_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
    (IPV4_RE, IP_TOKEN),
]


def scrub_pii(col: Column) -> Column:
    """Redact emails, phone numbers, and IPv4 addresses to fixed
    placeholder tokens (all occurrences; Spark's regexp_replace is
    global, oracle SQL must pass the global flag)."""
    out = col
    for pattern, token in _RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_count(col: Column, token: str) -> Column:
    """Occurrences of one placeholder token in already-scrubbed text
    via length arithmetic (replace-based so any oracle engine computes
    it identically; placeholder tokens cannot overlap)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("bigint")
