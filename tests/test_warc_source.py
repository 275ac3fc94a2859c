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


def test_parse_warc_single_member_whole_file_gzip():
    """Non-Common-Crawl layout: the WHOLE file compressed as one gzip
    member. The chunked decompressor + incremental framer must parse
    it identically (and without materializing the member — exercised
    at scale in the test below)."""
    from promptner_spark.sources.warc import parse_warc_bytes

    plain = list(parse_warc_bytes(_warc_bytes()))
    single = gzip.compress(_warc_bytes())
    assert list(parse_warc_bytes(single)) == plain


def test_parse_warc_many_members_linear_time():
    """~12k gzip members in one archive (the Common-Crawl shape). The
    old unused_data loop re-copied the remaining buffer per member —
    O(members × file) ≈ tens of GB of memcpy for this input; the
    chunked cursor is O(file) and finishes in well under a second."""
    import time

    from promptner_spark.sources.warc import parse_warc_bytes

    n = 12_000
    body = _http(b"<html><body>" + b"x" * 150 + b"</body></html>")
    records = [
        _record("response", f"https://ex.com/{i}",
                "2024-01-01T00:00:01Z", body)
        for i in range(n)
    ]
    blob = b"".join(gzip.compress(r) for r in records)
    assert len(blob) > 2_000_000  # big enough that quadratic = seconds

    t0 = time.monotonic()
    out = list(parse_warc_bytes(blob))
    elapsed = time.monotonic() - t0
    assert len(out) == n
    assert out[0][0] == "https://ex.com/0"
    assert out[-1][0] == f"https://ex.com/{n - 1}"
    assert all(h == body[body.find(b"\r\n\r\n") + 4:] for _, _, h in out[:5])
    # old implementation took >30 s here; linear path is ~0.1-0.3 s
    assert elapsed < 5.0, f"member loop not linear: {elapsed:.1f}s"


def test_parse_warc_records_span_decompression_chunks():
    """Records larger than the 1 MiB decompression feed size must be
    reassembled across chunk boundaries by the incremental framer."""
    from promptner_spark.sources.warc import parse_warc_bytes

    big = _http(b"A" * (3 * (1 << 20)))  # 3 MiB payload > chunk size
    blob = gzip.compress(
        _record("response", "https://ex.com/big",
                "2024-01-01T00:00:01Z", big)
        + _record("response", "https://ex.com/small",
                  "2024-01-01T00:00:02Z", _http(HTML_1)))
    out = list(parse_warc_bytes(blob))
    assert [u for u, _, _ in out] == \
        ["https://ex.com/big", "https://ex.com/small"]
    assert out[0][2] == b"A" * (3 * (1 << 20))
    assert out[1][2] == HTML_1


def test_parse_warc_resyncs_past_corrupt_header():
    """A record with a garbage Content-Length no longer aborts the
    file: the framer resyncs to the next WARC/ marker."""
    from promptner_spark.sources.warc import parse_warc_bytes

    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://ex.com/bad\r\n"
           b"Content-Length: oops\r\n\r\n")
    blob = bad + _record("response", "https://ex.com/ok",
                         "2024-01-01T00:00:01Z", _http(HTML_1))
    out = list(parse_warc_bytes(blob))
    assert [u for u, _, _ in out] == ["https://ex.com/ok"]
    assert out[0][2] == HTML_1


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
