"""URL canonicalization operators (llm/urls.py) — JVM-expression only."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.llm import urls


def _norm(spark, raw: str) -> dict:
    df = spark.createDataFrame([(raw,)], "url string")
    return urls.url_profile(df).collect()[0].asDict()


def test_normalize_url_contract(spark):
    cases = {
        # case folding + fragment drop
        "HTTPS://WWW.Example.COM/Path#frag": "https://www.example.com/Path",
        # default port drops, non-default stays
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:80/x": "http://a.com/x",
        "http://a.com:443/x": "http://a.com:443/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        # tracker strip + key sort + empty-query collapse
        "http://a.com/x?utm_source=s&b=2&a=1": "http://a.com/x?a=1&b=2",
        "http://a.com/x?fbclid=zz": "http://a.com/x",
        "http://a.com/x?gclid=1&UTM_medium=m": "http://a.com/x",
        # path normalization
        "http://a.com": "http://a.com/",
        "http://a.com/": "http://a.com/",
        "http://a.com/dir/": "http://a.com/dir",
        "http://a.com?a=1": "http://a.com/?a=1",
    }
    rows = spark.createDataFrame(
        [(k,) for k in cases], "url string"
    ).select("url", urls.normalize_url(F.col("url")).alias("n")).collect()
    got = {r["url"]: r["n"] for r in rows}
    assert got == cases
    # schemeless / relative input → NULL, never a crash
    assert _norm(spark, "not a url")["norm_url"] is None


def test_apex_domain_and_filtering(spark):
    df = spark.createDataFrame(
        [("http://www.news.example.co.uk/a",),
         ("https://blog.sample.com/b",),
         ("http://plain.com/c",),
         ("http://192.168.0.1/d",),
         ("ftp://files.example.com/e",),
         ("http://bad.com/f",)],
        "url string",
    )
    prof = urls.url_profile(df, blocked_domains=("bad.com",))
    by_url = {r["url"]: r for r in prof.collect()}
    assert by_url["http://www.news.example.co.uk/a"]["apex_domain"] == (
        "example.co.uk")
    assert by_url["https://blog.sample.com/b"]["apex_domain"] == "sample.com"
    assert by_url["http://plain.com/c"]["apex_domain"] == "plain.com"
    assert by_url["http://192.168.0.1/d"]["apex_domain"] == "192.168.0.1"
    # scheme filter and blocklist
    assert by_url["ftp://files.example.com/e"]["kept"] is False
    assert by_url["http://bad.com/f"]["kept"] is False
    assert by_url["http://plain.com/c"]["kept"] is True


def test_url_dedup_merges_variants(spark):
    variants = [
        "HTTP://A.com/p?utm_source=x&b=2&a=1#top",
        "http://a.COM:80/p/?a=1&b=2&utm_medium=y",
        "http://a.com/p?b=2&a=1",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    keys = (
        urls.url_profile(df).groupBy("norm_url").count().collect()
    )
    assert len(keys) == 1 and keys[0]["count"] == 3
    assert keys[0]["norm_url"] == "http://a.com/p?a=1&b=2"
