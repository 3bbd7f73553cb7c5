"""URL parsing / normalization (functions/url.py): RFC 3986 Appendix-B
decomposition, canonicalization rules, registered-domain heuristic."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_etl_self_service_spark.functions.url import (
    clean_query,
    normalize_url,
    registered_domain,
    url_host,
    url_path,
    url_port,
    url_query,
    url_scheme,
)


def _one(spark, url, col_fn):
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(col_fn(F.col("u")).alias("v")).collect()[0].v


def test_decomposition(spark):
    u = "HTTP://user:pw@Example.COM:8080/a/b?x=1&y=2#frag"
    assert _one(spark, u, url_scheme) == "http"
    assert _one(spark, u, url_host) == "example.com"
    assert _one(spark, u, url_port) == "8080"
    assert _one(spark, u, url_path) == "/a/b"
    assert _one(spark, u, url_query) == "x=1&y=2"


def test_normalize_rules(spark):
    cases = {
        # host case + default port + fragment
        "HTTPS://WWW.Ex.COM:443/p#top": "https://www.ex.com/p",
        "http://ex.com:80/": "http://ex.com/",
        # non-default port survives
        "http://ex.com:8080/a": "http://ex.com:8080/a",
        # empty path -> '/'
        "https://ex.com": "https://ex.com/",
        # tracking params dropped, rest sorted
        "https://ex.com/s?utm_source=x&b=2&a=1": "https://ex.com/s?a=1&b=2",
        "https://ex.com/s?gclid=abc&q=t": "https://ex.com/s?q=t",
        # all params dropped -> no '?'
        "https://ex.com/s?utm_campaign=c&fbclid=1": "https://ex.com/s",
        # userinfo stripped by host extraction
        "https://bob@ex.com/x": "https://ex.com/x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {
        r.u: r.n
        for r in df.select("u", normalize_url(F.col("u")).alias("n")).collect()
    }
    assert got == cases


def test_registered_domain(spark):
    cases = {
        "www.shop3.com": "shop3.com",
        "a.b.news.co.uk": "news.co.uk",
        "ex.com": "ex.com",
        "localhost": "localhost",
        "deep.sub.host.com.au": "host.com.au",
    }
    df = spark.createDataFrame([(k,) for k in cases], "h string")
    got = {
        r.h: r.d
        for r in df.select(
            "h", registered_domain(F.col("h")).alias("d")
        ).collect()
    }
    assert got == cases


def test_clean_query_empty_and_order(spark):
    assert _one(spark, "https://e.com/p", clean_query) == ""
    assert _one(spark, "https://e.com/p?b=2&a=1&a=0", clean_query) == "a=0&a=1&b=2"
