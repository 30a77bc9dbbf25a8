"""URL normalization + filtering — the crawl-side curation stage.

Every serious web-corpus pipeline (CCNet, RefinedWeb, FineWeb) begins
with URL-level work before any text is parsed: canonicalize URLs so the
same page crawled twice dedups, extract the registrable domain for
per-site caps and blocklists, and drop disallowed schemes/domains. The
reference has no crawl surface at all; this closes the stage that feeds
``sources/warc.py`` → ``llm/html.py``.

Everything here is a composition of JVM-side column expressions
(regexp + array functions — whole-stage-codegen friendly, no Python in
the hot path), because URL canonicalization is pure string algebra:

- scheme and host lowercase; an explicit default port (``:80`` http,
  ``:443`` https) drops; other ports stay
- the fragment drops (never sent to the server)
- tracking parameters drop (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``) and the surviving query keys sort — param order
  is not semantic, so sorting maximizes dedup hits
- an empty path before a query/end normalizes to ``/``; a trailing
  ``/`` on a non-root path drops (directory-vs-page ambiguity —
  documented choice, applied consistently)

``apex_domain`` uses the last-two-labels rule with an embedded set of
common two-level public suffixes (``co.uk``-style). The full Mozilla
Public Suffix List is the production answer; the set here is the
documented subset and the lookup is an O(1) expression either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query params that never affect content (trackers). Prefix match for
#: utm_*; exact match otherwise.
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")

#: Common second-level public suffixes (subset; see module docstring).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.nz", "co.in", "com.br", "com.cn",
    "com.mx", "co.za", "com.ar", "com.tr", "co.kr", "com.sg",
)

# Two regex passes over the full URL (scheme, host:port) feed EVERY
# part below; the rest is substring algebra on the (short) remainders.
# The previous five anchored regexes each re-scanned the whole string —
# port/path/query re-matched the scheme+authority prefix per call, so a
# url_profile projection paid ~5 full-string regex executions per row
# (codegen CSE dedups only IDENTICAL trees). Part semantics are pinned
# bit-for-bit to the original patterns by
# tests/test_urls.py::test_url_parts_match_original_regex_semantics
# (the malformed-input battery: junk ports, '?' after '#', empty
# hosts, schemeless input, ...).
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
#: authority = everything between '://' and the first '/', '?' or '#' —
#: the union of the old host ([^/?#:]*) and port segments.
_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"


def _raw_scheme(url: Column) -> Column:
    return F.regexp_extract(url, _SCHEME_RE, 1)  # '' when schemeless


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, _AUTHORITY_RE, 1)  # '' when schemeless


def url_scheme(url: Column) -> Column:
    return F.lower(F.nullif(_raw_scheme(url), F.lit("")))


def url_host(url: Column) -> Column:
    # old host class [^/?#:]* ≡ the authority cut at its first ':'
    return F.lower(
        F.nullif(F.substring_index(_authority(url), ":", 1), F.lit(""))
    )


def url_port(url: Column) -> Column:
    # old contract: a ':' immediately after the host, then LEADING
    # digits (junk tails like ':80x' still yield 80; ':x80' yields NULL)
    auth = _authority(url)
    pos = F.instr(auth, ":")
    after = F.when(pos > 0, auth.substr(pos + 1, F.length(auth)))
    return F.nullif(
        F.regexp_extract(F.coalesce(after, F.lit("")), r"^(\d+)", 1),
        F.lit(""),
    ).cast("int")


def url_path(url: Column) -> Column:
    # everything after the authority, cut at the first '?' or '#' (the
    # old ([^?#]*) capture); NULL when schemeless — the old anchored
    # pattern failed to match at all
    rest = url.substr(
        F.length(_raw_scheme(url)) + 4 + F.length(_authority(url)),
        F.length(url),
    )
    return F.when(
        _raw_scheme(url) != "",
        F.nullif(
            F.substring_index(F.substring_index(rest, "?", 1), "#", 1),
            F.lit(""),
        ),
    )


def url_query(url: Column) -> Column:
    # old pattern \?([^#]*) was UNANCHORED: the first '?' anywhere in
    # the string (even inside a fragment) starts the query
    pos = F.instr(url, "?")
    return F.nullif(
        F.when(pos > 0, F.substring_index(url.substr(pos + 1, F.length(url)), "#", 1)),
        F.lit(""),
    )


def apex_domain(host: Column) -> Column:
    """Registrable domain: last 2 labels, or 3 when the last 2 are a
    known two-level public suffix. IPv4 hosts pass through whole."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_ip = host.rlike(r"^\d+\.\d+\.\d+\.\d+$")
    return (
        F.when(host.isNull() | is_ip | (n <= 2), host)
        .when(last2.isin(*TWO_LEVEL_SUFFIXES) & (n >= 3), last3)
        .otherwise(last2)
    )


def _clean_query(url: Column) -> Column:
    """Split query → drop trackers → sort keys → rejoin ('' when empty)."""
    q = url_query(url)
    parts = F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda p: (p != "")
        & ~F.lower(p).startswith("utm_")
        & ~F.lower(F.split(p, "=")[0]).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(parts), "&")


def normalize_url(url: Column) -> Column:
    """Canonical form per the module contract (NULL for schemeless input)."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    default = (
        ((scheme == "http") & (port == 80))
        | ((scheme == "https") & (port == 443))
    )
    port_part = F.when(port.isNotNull() & ~default,
                       F.concat(F.lit(":"), port.cast("string"))
                       ).otherwise(F.lit(""))
    raw_path = F.coalesce(url_path(url), F.lit("/"))
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - 1),
    ).otherwise(raw_path)
    query = _clean_query(url)
    q_part = F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
        F.lit("")
    )
    return F.when(
        scheme.isNotNull() & host.isNotNull(),
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part),
    )


def url_profile(
    df: DataFrame,
    url_col: str = "url",
    *,
    blocked_domains: tuple[str, ...] = (),
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """Annotate rows with the canonical URL, host, apex domain, and a
    ``kept`` verdict (scheme allowed ∧ domain not blocked ∧ parseable).
    Pure narrow transformation — no shuffle; the downstream dedup
    (groupBy ``norm_url``) or per-site cap (groupBy ``apex``) supplies
    the only wide stage, keyed exactly by these columns."""
    url = F.col(url_col)
    host = url_host(url)
    apex = apex_domain(host)
    scheme = url_scheme(url)
    kept = (
        scheme.isin(*allowed_schemes)
        & host.isNotNull()
        & (~apex.isin(*blocked_domains) if blocked_domains else F.lit(True))
    )
    return df.select(
        "*",
        normalize_url(url).alias("norm_url"),
        scheme.alias("scheme"),
        host.alias("host"),
        apex.alias("apex_domain"),
        F.coalesce(kept, F.lit(False)).alias("kept"),
    )
