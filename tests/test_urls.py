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


#: Adversarial/malformed battery for the single-pass parse rewrite
#: (round-11 "Not yet optimized" item 5: the rewrite must match the
#: anchored-regex contract bit-for-bit on malformed inputs).
_PARSE_CASES = [
    "https://example.com/path?a=1&b=2#frag",
    "HTTPS://WWW.Example.COM:443/Path/",
    "http://a.com:80",
    "http://a.com:8080/x?utm_source=s",
    "http://h:80x/p",          # digits-then-junk port (port=80 by contract)
    "http://h:abc/p",          # non-digit port → NULL, path keeps /p
    "http://h::80/x",          # double colon → port NULL
    "http://h:/p",             # colon, no digits
    "http://",                 # empty host
    "http:///p",               # empty host, path present
    "http://h",                # no path
    "http://h?a=1",            # query, no path
    "http://h#f",              # fragment, no path
    "http://h/p#f?notquery",   # '?' AFTER '#': query regex still finds it
    "http://h/p?q#f",          # '#' after '?'
    "http://h/p?a?b=c",        # second '?' inside query
    "http://h/p??",            # empty double query
    "example.com/x",           # schemeless
    "1http://x/",              # bad scheme first char
    "ht!tp://x/",              # bad scheme charset
    "ftp+ssh-1.x://host/p",    # exotic but legal scheme chars
    "://x/",                   # empty scheme
    "",                        # empty string
    "http://192.168.0.1:99/p", # IPv4 + port
    "https://H.Co.UK:443/",    # two-level suffix, default port
    "http://h/p/?a=&=b&c",     # degenerate query params
    "http://h/p#",             # empty fragment
    "http://h/#?",             # '#' then '?' then end
    "http://xn--bcher-kva.com/ü?ä=ö#ß",  # non-ascii
]


def _py_reference_parts(url: str) -> tuple:
    """The ORIGINAL five-regex semantics, replayed with Python `re` —
    the equivalence oracle for the single-pass parse (Java and Python
    regex agree on these POSIX-ish character-class patterns)."""
    import re

    def ext(pattern: str) -> str | None:
        m = re.search(pattern, url)
        return (m.group(1) or None) if m else None

    scheme = ext(r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://")
    host = ext(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]*)")
    port = ext(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#:]*:(\d+)")
    path = ext(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)")
    query = ext(r"\?([^#]*)")
    return (
        scheme.lower() if scheme else None,
        host.lower() if host else None,
        int(port) if port else None,
        path,
        query,
    )


def test_url_parts_match_original_regex_semantics(spark):
    df = spark.createDataFrame([(u,) for u in _PARSE_CASES], "url string")
    u = F.col("url")
    rows = df.select(
        "url",
        urls.url_scheme(u).alias("s"),
        urls.url_host(u).alias("h"),
        urls.url_port(u).alias("p"),
        urls.url_path(u).alias("pa"),
        urls.url_query(u).alias("q"),
    ).collect()
    for r in rows:
        want = _py_reference_parts(r["url"])
        got = (r["s"], r["h"], r["p"], r["pa"], r["q"])
        assert got == want, f"{r['url']!r}: got {got}, want {want}"


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
