"""URL canonicalization (web-corpus dedup prep).

Two crawls of the same page rarely carry byte-identical URLs:
scheme/host case, default ports, tracking parameters, parameter
order, and fragments all vary without changing the resource. URL
dedup therefore keys on a CANONICAL form:

- scheme and host lowercased (RFC 3986 §6.2.2.1); path case KEPT
  (paths are case-sensitive);
- userinfo (``user:pass@``) dropped — it never distinguishes the
  resource, and lowercasing credentials would corrupt them;
- default ports stripped (``:80`` http, ``:443`` https);
- a leading ``www.`` dropped from the host (the common crawl-dedup
  convention — example.com and www.example.com are one site);
- tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters SORTED by name (order never
  distinguishes resources), empty query dropped;
- the fragment dropped (never sent to the server);
- an empty path normalized to ``/``.

Pure column algebra: one regex split into parts, ``split`` →
``filter`` → ``array_sort`` → ``array_join`` for the query
parameters. Shuffle-free and codegen'd — canonicalizing 100 TB of
crawl metadata is a projection, not a job.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PARTS = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
_TRACKING = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def _canonical_host(scheme: Column, auth: Column) -> Column:
    """Shared origin rule for ``url_host`` AND ``normalize_url``:
    lowercased authority minus userinfo, minus the SCHEME-DEFAULT
    port (``:80`` http, ``:443`` https), minus a leading ``www.``.
    ONE definition on purpose — the r4 origin-disagreement bug was
    two hand-maintained copies drifting (url_host stripped ANY
    port); any future origin-rule change lands here once."""
    host = F.regexp_replace(auth, r"^[^@]*@", "")
    host = (
        F.when(scheme == F.lit("https"), F.regexp_replace(host, r":443$", ""))
        .when(scheme == F.lit("http"), F.regexp_replace(host, r":80$", ""))
        .otherwise(host)
    )
    return F.regexp_replace(host, r"^www\.", "")


def url_host(col: Column) -> Column:
    """Canonical host: lowercased authority with userinfo
    (``user:pass@``), the SCHEME-DEFAULT port (``:80`` http, ``:443``
    https), and a leading ``www.`` removed. NULL for strings that
    don't parse as URLs.

    A NON-default port survives, exactly as in ``normalize_url`` —
    ``example.com:8080`` is a different origin than ``example.com``,
    and host-level grouping (per-host caps) must agree with
    canonical-URL dedup about origin identity; both call
    :func:`_canonical_host`."""
    scheme = F.lower(F.regexp_extract(col, _PARTS, 1))
    auth = F.lower(F.regexp_extract(col, _PARTS, 2))
    return F.when(F.length(auth) > 0, _canonical_host(scheme, auth))


def normalize_url(col: Column) -> Column:
    """Canonical URL per the module rules. NULL for non-URLs."""
    scheme = F.lower(F.regexp_extract(col, _PARTS, 1))
    auth = F.lower(F.regexp_extract(col, _PARTS, 2))
    path = F.regexp_extract(col, _PARTS, 3)
    query = F.regexp_extract(col, _PARTS, 4)

    # userinfo dropped, scheme-default port stripped, www. peeled —
    # the shared origin rule (see _canonical_host)
    host = _canonical_host(scheme, auth)

    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.when(
        F.length(scheme) > 0,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(F.length(path) > 0, path).otherwise(F.lit("/")),
            F.when(F.length(qs) > 0, F.concat(F.lit("?"), qs)).otherwise(
                F.lit("")
            ),
        ),
    )
