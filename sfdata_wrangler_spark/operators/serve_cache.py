"""Cross-call cache of broadcast-sized serve artifacts (VERDICT r10
ask #1: serve_warm headroom).

Every ``serve_pruned`` call re-resolved its coarse centroids and
residual codebooks by re-reading their parquet artifacts — two footer
reads plus two scan stages per query batch. The artifacts are
broadcast-sized by construction (k·m·sub_dim and n_codes·m·sub_dim
long-form rows — hundreds to a few thousand ints) and WRITE-ONCE per
generation (a rotation writes a NEW generation dir and swaps a
pointer; ``ingest_batch`` appends only to ``codes/``, never to the
quantizers), so a serving process can resolve them once and reuse a
driver-local copy until the pointer moves.

The cache maps ``(applicationId, path, token)`` to a pure-JVM
LocalRelation (``sources.inline.values_df`` — NOT
``spark.createDataFrame``, which parallelizes through Python runners
and costs ~seconds per downstream action on local[32]). The token is
the invalidation handle: the GENERATION NAME for rotated roots
(generations are claim-allocated and never reused, so the name alone
identifies immutable quantizers) and the build-marker mtime for the
session-scratch bench index. Keying on applicationId makes entries
from a dead session unreachable (a DataFrame is bound to the session
that built it — the module-level pandas_udf staleness class); the
LRU cap bounds what a long-running multi-index server can pin.

Scale note: this cache holds kilobytes per index generation on the
DRIVER only. The codes lake — the part that scales with the corpus —
is never cached here; it stays a cid-pruned parquet scan.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

from pyspark.sql import DataFrame

from ..sources.inline import values_df

_MAX_ENTRIES = 64
_LOCK = threading.Lock()
_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()


def _schema_str(df: DataFrame) -> str:
    return ", ".join(f"{n}: {t}" for n, t in df.dtypes)


def cached_local_artifact(spark, path: str, token) -> DataFrame:
    """A LocalRelation copy of the broadcast-sized parquet artifact at
    ``path``, collected once per ``(session, path, token)`` and served
    from the driver-local cache afterwards. ONLY for artifacts that
    are immutable for a given token (quantizer tables of a write-once
    generation): a mutated artifact under an unchanged token would be
    served stale by design."""
    key = (spark.sparkContext.applicationId, path, str(token))
    with _LOCK:
        hit = _CACHE.get(key)
        if hit is not None:
            _CACHE.move_to_end(key)
            return hit
    src = spark.read.parquet(path)
    df = values_df(
        spark, _schema_str(src), [tuple(r) for r in src.collect()]
    )
    with _LOCK:
        _CACHE[key] = df
        while len(_CACHE) > _MAX_ENTRIES:
            _CACHE.popitem(last=False)
    return df


def invalidate(spark=None) -> None:
    """Drop every cached artifact (tests; or a caller that mutated an
    artifact in place against the contract)."""
    with _LOCK:
        _CACHE.clear()
