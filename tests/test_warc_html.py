"""WARC source + HTML text extraction (sources/warc.py, llm/html.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.llm import html as H
from sql_data_warehouse_analytics_project_spark.sources import warc


def _resp_record(i: int, body: bytes, status: int = 200) -> bytes:
    return warc.build_warc_record(
        "response",
        warc.build_http_response(body, status=status),
        record_id=f"{i:08x}",
        target_uri=f"https://example.org/doc/{i}",
        content_type="application/http;msgtype=response",
    )


def test_warc_record_roundtrip_plain_and_gzip():
    body = b"<html><body><p>hello</p></body></html>"
    info = warc.build_warc_record(
        "warcinfo", b"software: x\r\n", record_id="a-info",
        content_type="application/warc-fields",
    )
    resp = _resp_record(5, body)
    for blob in (info + resp,
                 warc.gzip_member(info) + warc.gzip_member(resp)):
        recs = warc.parse_warc_file_bytes(blob)
        assert [r["warc-type"] for r in recs] == ["warcinfo", "response"]
        assert recs[1]["warc-target-uri"] == "https://example.org/doc/5"
        status, headers, got = warc.parse_http_response(recs[1]["payload"])
        assert (status, got) == (200, body)
        assert headers["content-type"].startswith("text/html")
    # non-HTTP payloads (WET conversion records) pass through unchanged
    st, hh, bd = warc.parse_http_response(b"plain text payload")
    assert st is None and bd == b"plain text payload"


def test_warc_parse_rejects_structural_damage():
    resp = _resp_record(1, b"x" * 40)
    with pytest.raises(ValueError):
        warc.parse_warc_bytes(resp[:-30])  # truncated payload
    with pytest.raises(ValueError):
        warc.parse_warc_bytes(b"NOT A WARC" + resp)
    with pytest.raises(ValueError):
        list(warc.split_gzip_members(warc.gzip_member(resp)[:-4] + b"zzzz"))


def test_html_extraction_blocks_boilerplate_and_title():
    page = (
        "<html><head><title>T &amp; U</title><style>p{}</style>"
        "<script>var x='<p>not text</p>';</script></head><body>"
        "<nav><a href='/'>home</a> <a href='/x'>idx</a></nav>"
        "<h1>Head</h1><p>one  two\nthree</p>"
        "<div>mixed <a href='/y'>link</a> prose that is long enough</div>"
        "<footer><a href='/a'>about</a></footer></body></html>"
    )
    blocks = H.html_text_blocks(page)
    texts = [b[0] for b in blocks]
    assert texts == ["home idx", "Head", "one two three",
                     "mixed link prose that is long enough", "about"]
    # script/style content never leaks; entities decode in the title
    assert H.extract_title(page) == "T & U"
    # boilerplate filter: nav (8/8 anchor) and footer (5/5) drop, the
    # mixed-prose div (4/36) survives
    kept = H.extract_html_text(page, drop_boilerplate=True)
    assert kept == "Head\none two three\nmixed link prose that is long enough"
    # min_block_chars drops short blocks too
    assert H.extract_html_text(
        page, drop_boilerplate=True, min_block_chars=5
    ) == "one two three\nmixed link prose that is long enough"
    # malformed HTML never raises
    assert H.extract_html_text("<p>a<b<i>b</p >c", drop_boilerplate=False)


def test_read_warc_files_and_extraction_pipeline(spark, tmp_path):
    html5 = b"<html><body><h1>Five</h1><p>body five</p></body></html>"
    html6 = b"<html><body><h1>Six</h1><p>body six</p></body></html>"
    (tmp_path / "a.warc").write_bytes(_resp_record(5, html5))
    (tmp_path / "b.warc.gz").write_bytes(
        warc.gzip_member(_resp_record(6, html6))
    )
    (tmp_path / "c.warc").write_bytes(b"garbage not warc")
    (tmp_path / "ignored.txt").write_bytes(b"skipped by glob")

    recs = warc.read_warc(spark, str(tmp_path))
    rows = {r["source_file"].rsplit("/", 1)[-1]: r for r in recs.collect()}
    assert rows["a.warc"]["parse_ok"] and rows["b.warc.gz"]["parse_ok"]
    assert rows["c.warc"]["parse_ok"] is False
    assert "ignored.txt" not in rows

    pages = warc.response_documents(recs)
    out = {
        r["target_uri"]: r
        for r in H.html_to_text(pages, drop_boilerplate=True).collect()
    }
    assert out["https://example.org/doc/5"]["text"] == "Five\nbody five"
    assert out["https://example.org/doc/6"]["text"] == "Six\nbody six"
    assert out["https://example.org/doc/6"]["n_blocks_kept"] == 2


def test_synthesize_warc_crawl_matches_closed_form(spark):
    docs = spark.createDataFrame(
        [(i, f"text body  {i}\nwith   spaces") for i in (1, 3, 7, 97, 194)],
        "doc_id bigint, text string",
    )
    crawl = warc.synthesize_warc_crawl(docs)
    recs = warc.warc_records(crawl, source_col="media_id")
    got = {}
    for r in recs.collect():
        got.setdefault(r["source_file"], []).append(r)
    # 97/194: truncated → single flagged row
    for bad in ("97", "194"):
        assert len(got[bad]) == 1 and got[bad][0]["parse_ok"] is False
    # 3 is gzipped (member-per-record), still 3 records
    assert [r["warc_type"] for r in got["3"]] == [
        "warcinfo", "request", "response"]
    # 7 → 404 page
    resp7 = [r for r in got["7"] if r["warc_type"] == "response"][0]
    assert resp7["http_status"] == 404
    # 1 → 200 with the wrapped text; extraction recovers the closed form
    pages = warc.response_documents(recs)
    ext = H.html_to_text(
        pages, id_cols=("target_uri",), drop_boilerplate=True
    ).collect()
    by_uri = {r["target_uri"]: r for r in ext}
    assert by_uri["https://example.org/doc/1"]["text"] == (
        "Title 1\ntext body 1 with spaces")
    assert by_uri["https://example.org/doc/1"]["title"] == "Doc 1"
    assert by_uri["https://example.org/doc/7"]["text"] == "not found"
