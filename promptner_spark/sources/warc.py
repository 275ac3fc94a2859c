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
- gzip is handled member-wise (CC compresses each record as its own
  gzip member): one ``zlib`` decompressobj per member, re-fed with
  ``unused_data`` — no whole-file buffer.

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


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (the
    Common-Crawl layout: one member per WARC record). Plain bytes pass
    through untouched."""
    if not blob.startswith(b"\x1f\x8b"):
        yield blob
        return
    rest = blob
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        yield d.decompress(rest)
        rest = d.unused_data


def _split_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """(headers, payload) per WARC record in a raw (decompressed)
    buffer. Uses Content-Length — the spec's framing — rather than
    scanning for boundary markers that could occur inside payloads."""
    pos = 0
    n = len(raw)
    while pos < n:
        if raw[pos:pos + 5] != b"WARC/":
            nxt = raw.find(b"WARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt
        head_end = raw.find(_CRLF2, pos)
        if head_end < 0:
            return
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace").lower()] = \
                    v.strip().decode("utf-8", "replace")
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + len(_CRLF2)
        yield headers, raw[body_start:body_start + length]
        # spec: each record is followed by two CRLFs
        pos = body_start + length + 2 * len(b"\r\n")


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
    for member in _gzip_members(blob):
        for headers, body in _split_records(member):
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
