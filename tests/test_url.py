"""URL canonicalization (functions/url.py)."""

from pyspark.sql import functions as F

from sfdata_wrangler_spark.functions.url import normalize_url, url_host


def _norm(spark, *urls):
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    return [
        (r.n, r.h)
        for r in df.select(
            normalize_url(F.col("u")).alias("n"),
            url_host(F.col("u")).alias("h"),
        ).collect()
    ]


def test_full_canonicalization(spark):
    (n, h), = _norm(
        spark, "HTTPS://WWW.Example.COM:443/Path/One?utm_source=x&b=2&a=1#f"
    )
    assert n == "https://example.com/Path/One?a=1&b=2"
    assert h == "example.com"


def test_path_case_preserved_scheme_host_lowered(spark):
    (n, _), = _norm(spark, "HTTP://HOST.ORG/CaseSensitive/Path")
    assert n == "http://host.org/CaseSensitive/Path"


def test_default_vs_nondefault_ports(spark):
    out = _norm(
        spark,
        "http://e.com:80/x",
        "https://e.com:443/x",
        "http://e.com:8080/x",
        "https://e.com:80/x",  # 80 is NOT https's default: keep
    )
    assert [n for n, _ in out] == [
        "http://e.com/x",
        "https://e.com/x",
        "http://e.com:8080/x",
        "https://e.com:80/x",
    ]


def test_empty_path_and_query_and_fragment(spark):
    (n, _), = _norm(spark, "https://e.com?utm_source=x#frag")
    assert n == "https://e.com/"


def test_www_stripped_only_as_label(spark):
    out = _norm(spark, "https://www.e.com/x", "https://www-site.org/x")
    assert out[0][1] == "e.com"
    assert out[1][1] == "www-site.org"


def test_non_url_is_null(spark):
    assert _norm(spark, "not a url") == [(None, None)]
