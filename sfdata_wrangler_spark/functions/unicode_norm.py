"""Unicode normalization for text columns (NFC / NFKC / NFD / NFKD).

Web-crawl corpora mix composed and decomposed forms of the same text
("é" as U+00E9 vs "e"+U+0301), fullwidth/halfwidth variants, and
compatibility ligatures — all of which defeat exact dedup keys,
shingle matching, and token counting unless canonicalized first. The
reference predates this concern (its inputs are agency CSVs); for a
training-data pipeline it is table stakes.

Spark has no built-in normalizer, so this is an Arrow-batched scalar
pandas UDF over stdlib ``unicodedata`` — the sanctioned slow path,
and a map-only projection (no shuffle; at 100 TB it rides the scan).
Cross-engine parity: Unicode normalization is covered by the
stability policy (normalized forms of assigned characters never
change between Unicode versions), so Python's ``unicodedata`` and
DuckDB's ``nfc_normalize`` agree — which is what lets the NFC path
be hash-checked by the driver (txt_nfc_normalize). NFKC/NFD/NFKD
have no DuckDB builtin; they are pytest-verified against
``unicodedata`` ground truth instead.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def _udf_for(form: str):
    """Built per call on purpose: a pandas_udf lazily binds its Java
    handle to the session that first evaluates it, so a module-level
    cache would go stale (dead-JVM py4j errors) after a session
    restart in a long-lived driver. Construction is cheap — a column
    expression registers nothing."""
    from pyspark.sql.functions import pandas_udf

    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else unicodedata.normalize(form, x)
        )

    return pandas_udf(_norm, "string")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Normalize a string column to the given Unicode form."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}: {form!r}")
    return _udf_for(form)(col)


def nfc(col: Column) -> Column:
    """Canonical composition — the dedup-key canonicalizer."""
    return unicode_normalize(col, "NFC")


def nfkc(col: Column) -> Column:
    """Compatibility composition — also folds fullwidth forms,
    ligatures, superscripts; the aggressive pre-tokenization form."""
    return unicode_normalize(col, "NFKC")


def is_nfc(col: Column) -> Column:
    """True when the value is already NFC — the cheap audit column
    (count the violators before paying for a rewrite). Null input
    yields null via SQL null-equality semantics."""
    return col == unicode_normalize(col, "NFC")
