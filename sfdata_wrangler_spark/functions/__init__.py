from .datetime_fns import (
    dow_class,
    fiscal_year,
    month_spine,
    month_trunc,
    service_date_rollover,
    tod_period,
    wraparound_timestamp,
)
from .metrics import cpi_factor, ontime5, safe_ratio, signed_deviation_minutes, speed
from .text import (
    doc_fingerprint,
    norm_key,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)

__all__ = [
    "dow_class",
    "fiscal_year",
    "month_spine",
    "month_trunc",
    "service_date_rollover",
    "tod_period",
    "wraparound_timestamp",
    "cpi_factor",
    "ontime5",
    "safe_ratio",
    "signed_deviation_minutes",
    "speed",
    "doc_fingerprint",
    "norm_key",
    "normalize_text",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "word_shingles",
]
