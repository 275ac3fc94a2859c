"""WARC ingest (sources/warc.py): spec-framed record parsing (pure
function) + the Spark binaryFile→mapInPandas reader + the adapter into
the pipeline's pages shape."""

from __future__ import annotations

import gzip


def _record(wtype: str, url: str | None, ts: str, payload: bytes) -> bytes:
    headers = [b"WARC/1.0",
               f"WARC-Type: {wtype}".encode()]
    if url:
        headers.append(f"WARC-Target-URI: {url}".encode())
    headers += [f"WARC-Date: {ts}".encode(),
                f"Content-Length: {len(payload)}".encode()]
    return b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


HTML_1 = b"<html><head><title>doc 1 [en]</title></head><body><article><p>alpha beta</p></article></body></html>"
HTML_2 = b"<html><body><p>the quick brown fox and the lazy dog</p></body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", None, "2024-01-01T00:00:00Z", b"software: test")
        + _record("request", "https://ex.com/1", "2024-01-01T00:00:01Z",
                  b"GET / HTTP/1.1\r\n\r\n")
        + _record("response", "https://ex.com/1", "2024-01-01T00:00:01Z",
                  _http(HTML_1))
        + _record("response", "https://ex.com/2", "2024-01-02T10:30:00Z",
                  _http(HTML_2))
    )


def test_parse_warc_bytes_plain_and_gzip_members():
    from promptner_spark.sources.warc import parse_warc_bytes

    plain = list(parse_warc_bytes(_warc_bytes()))
    # only the two response records survive; http headers stripped
    assert [(u, h) for u, _, h in plain] == [
        ("https://ex.com/1", HTML_1), ("https://ex.com/2", HTML_2)]
    assert plain[0][1] == "2024-01-01T00:00:01Z"

    # Common-Crawl layout: one gzip member PER RECORD
    members = b"".join(gzip.compress(r) for r in (
        _record("request", "https://ex.com/1", "2024-01-01T00:00:01Z", b"x"),
        _record("response", "https://ex.com/1", "2024-01-01T00:00:01Z",
                _http(HTML_1)),
        _record("response", "https://ex.com/2", "2024-01-02T10:30:00Z",
                _http(HTML_2)),
    ))
    assert list(parse_warc_bytes(members)) == plain


def test_read_warc_and_pages_adapter(spark, tmp_path):
    from promptner_spark.sources.warc import pages_from_warc, read_warc

    p = tmp_path / "crawl-00000.warc.gz"
    p.write_bytes(b"".join(
        gzip.compress(r) for r in [_warc_bytes()]))

    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://ex.com/1", "https://ex.com/2"}
    assert bytes(rows["https://ex.com/1"]["html"]) == HTML_1
    assert str(rows["https://ex.com/2"]["warc_ts"]) \
        == "2024-01-02 10:30:00"

    pages = pages_from_warc(spark, str(tmp_path / "*.warc.gz"))
    got = {r["url"]: r for r in pages.collect()}
    # byte-identical extractor pulled the <p> text; lang-ID ran
    assert got["https://ex.com/1"]["text"] == "alpha beta"
    assert got["https://ex.com/2"]["text"] \
        == "the quick brown fox and the lazy dog"
    assert got["https://ex.com/2"]["lang"] == "en"
    # pages shape plugs straight into the sentence splitter
    from promptner_spark.sources.sentences import split_sentences
    assert split_sentences(pages.select(
        "url", "warc_ts", "lang", "text", "extract_ok")).count() >= 2
