"""WARC (ISO 28500 web-archive) ingest → the pages table shape.

The north_star input is an Iceberg pages table, but the table itself
is MADE from crawl archives: at 100 TB the raw input is WARC files
(Common-Crawl layout — gzip member per record, ~1 GiB per file). This
module is that first hop, Spark-first:

- ``spark.read.format("binaryFile")`` lists and reads whole archive
  files; one file = one task (CC sizes files to ~1 GiB exactly so this
  is the right granularity — parallelism comes from file COUNT, which
  at 100 TB is ~10⁵ files).
- record parsing runs inside ``mapInPandas`` per file, streaming:
  records are yielded in bounded batches, so executor memory is
  bounded by batch size + one record, never by file size.
- gzip is decompressed in bounded chunks (1 MiB) across members: an
  offset into a ``memoryview`` advances by exactly the bytes each
  ``decompressobj`` consumed, so total bytes moved is O(file) even
  for Common Crawl's ~10⁵ members per ~1 GiB archive, and records
  are framed INCREMENTALLY from the chunk stream — peak memory is
  one record (header + Content-Length payload), never one member or
  one file, including the single-member whole-file-gzip layout.

Only ``response`` records with an http payload become pages; request /
metadata / warcinfo records are skipped. The http status line +
headers are stripped — the page payload (html bytes) stays opaque
BINARY for the downstream byte-identical extractor (sources/pages.py).

Format knowledge is the public WARC/1.x spec + Common Crawl's
published layout; the reference has no crawl ingest at all (this is
part of the beyond-reference pipeline surface, SURVEY.md §2.12).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

WARC_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
])

_CRLF2 = b"\r\n\r\n"
_MARK = b"WARC/"
_CHUNK = 1 << 20  # decompression feed size — caps per-call memcpy


def _decompressed_chunks(blob: bytes) -> Iterator[bytes]:
    """Yield bounded decompressed chunks across ALL gzip members of a
    (possibly multi-member) stream; plain bytes pass through as one
    chunk. O(len(blob)) total bytes moved: the cursor advances by the
    exact count each ``decompressobj`` consumed (``len(chunk) -
    len(unused_data)``) instead of re-copying the remaining buffer per
    member."""
    if not blob.startswith(b"\x1f\x8b"):
        yield blob
        return
    view = memoryview(blob)
    pos, n = 0, len(blob)
    while pos < n and blob[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        while not d.eof and pos < n:
            chunk = view[pos:pos + _CHUNK]
            out = d.decompress(chunk)
            pos += len(chunk) - len(d.unused_data)
            if out:
                yield out
        tail = d.flush()
        if tail:
            yield tail


def _parse_headers(head: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in head.split(b"\r\n")[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
    return headers


def _stream_records(chunks: Iterator[bytes]) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record, framed incrementally from a
    stream of byte chunks. Uses Content-Length — the spec's framing —
    rather than scanning for boundary markers that could occur inside
    payloads. Peak buffered memory is one record; a header with a
    missing/invalid Content-Length resyncs to the next ``WARC/``
    marker instead of aborting the file."""
    buf = bytearray()

    def drain(final: bool) -> Iterator[tuple[dict, bytes]]:
        while True:
            if not buf.startswith(_MARK):
                idx = buf.find(_MARK)
                if idx < 0:
                    # keep a tail that could be a marker split across chunks
                    if len(buf) >= len(_MARK):
                        del buf[:len(buf) - (len(_MARK) - 1)]
                    return
                del buf[:idx]
            head_end = buf.find(_CRLF2)
            if head_end < 0:
                return  # need more data (or truncated header at EOF)
            try:
                headers = _parse_headers(bytes(buf[:head_end]))
                length = int(headers.get("content-length", ""))
            except ValueError:
                del buf[:len(_MARK)]  # corrupt header: resync
                continue
            body_start = head_end + len(_CRLF2)
            if not final and len(buf) < body_start + length:
                return  # need more data
            payload = bytes(buf[body_start:body_start + length])
            # spec: each record is followed by two CRLFs
            del buf[:min(body_start + length + 2 * len(b"\r\n"), len(buf))]
            yield headers, payload
            if final and not buf:
                return

    for chunk in chunks:
        buf += chunk
        yield from drain(final=False)
    yield from drain(final=True)


def _http_payload(body: bytes) -> bytes:
    """Strip the http status line + headers from a response payload."""
    if body.startswith(b"HTTP/"):
        sep = body.find(_CRLF2)
        if sep >= 0:
            return body[sep + len(_CRLF2):]
    return body


def parse_warc_bytes(blob: bytes) -> Iterator[tuple[str, str, bytes]]:
    """(url, iso_ts, html_bytes) for every ``response`` record in one
    WARC file's bytes (gzip members or plain). Pure function — the
    unit-testable core the Spark reader wraps."""
    for headers, body in _stream_records(_decompressed_chunks(blob)):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        if not url:
            continue
        yield url, ts or "", _http_payload(body)


def read_warc(spark: SparkSession, path: str,
              batch_rows: int = 1024) -> DataFrame:
    """path (glob of .warc / .warc.gz files) → (url, warc_ts, html).

    One input file = one task (binaryFile source); records stream out
    in ``batch_rows`` chunks so memory is bounded. At crawl scale,
    partition count = file count — repartition downstream if files
    are few and large (the pipeline's extraction stage already
    repartitions by url hash)."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(rows):
            pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
            pdf["warc_ts"] = pd.to_datetime(
                pdf["warc_ts"], errors="coerce", utc=True
            ).dt.tz_localize(None)
            return pdf

        for pdf in batches:
            rows: list[tuple] = []
            for blob in pdf["content"]:
                for url, ts, html in parse_warc_bytes(bytes(blob)):
                    rows.append((url, ts, html))
                    if len(rows) >= batch_rows:
                        yield flush(rows)
                        rows = []
            if rows:
                yield flush(rows)

    return files.mapInPandas(parse, schema=WARC_PAGES_SCHEMA)


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files → the pipeline's pages shape (url, warc_ts, lang,
    text, extract_ok), ready for ``split_sentences``: text is the
    byte-identical extractor over the archived html, lang is the
    n-gram language-ID heuristic (functions/textstats.py)."""
    from ..functions.textstats import lang_id
    from .pages import extract_text

    raw = read_warc(spark, path)
    text = extract_text(F.col("html"))
    return raw.select(
        "url", "warc_ts",
        lang_id(text).alias("lang"),
        text.alias("text"),
        F.lit(True).alias("extract_ok"),
    )
