"""WARC source: read Common-Crawl-style WARC files into the pages
table shape ``(url, warc_ts, html, text, lang)``.

The reference reads one PDF per process invocation (main.rs:67-73);
at crawl scale the raw bytes land as WARC archives (ISO 28500), so the
engine needs a WARC → pages-table ingest path.  Spark-first design:

* ``spark.read.format("binaryFile")`` lists and reads whole WARC
  files — files are the parallel unit (a WARC member is not
  split-able mid-record), exactly how Common Crawl ships segments.
* ``mapInPandas`` splits each archive into page rows — Arrow-batched,
  one Python call per batch of files, never per record.
* The parser is a small pure-Python record scanner (header block +
  Content-Length + double CRLF framing) with an embedded-HTTP-response
  body split for ``response`` records.  Gzip members
  (``.warc.gz`` multistream) are handled via ``zlib`` with the gzip
  wbits — C speed, same as the engine's FlateDecode path.

Only ``response``/``resource`` records become rows; ``warcinfo``/
``request``/``metadata`` records are skipped.  Parse problems are
row-level (a bad record ends that FILE's scan, never the task),
mirroring the extraction job's error-column discipline.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd

CRLF = b"\r\n"
PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members (CC WARCs are one member per
    record); plain data passes through."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        data = d.unused_data
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Scan WARC records: list of ``{headers: dict, body: bytes}``.

    Framing per ISO 28500: ``WARC/1.x`` version line, header lines to
    a blank line, exactly ``Content-Length`` body bytes, then two
    CRLFs before the next record.
    """
    data = _gunzip_members(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break  # malformed tail: stop scanning this file
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            break
        headers = {}
        lines = data[pos:head_end].split(CRLF)
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        if len(body) < length:
            break
        records.append({"headers": headers, "body": body})
        pos = body_start + length
    return records


def _http_body(payload: bytes) -> bytes:
    """Split the HTTP response head off a ``response`` record body."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(CRLF + CRLF)
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def _warc_ts_micros(value: str) -> int:
    """WARC-Date (ISO 8601 Zulu) → epoch micros; 0 if absent/bad."""
    try:
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except (ValueError, AttributeError):
        return 0


def warc_to_page_rows(data: bytes) -> list[tuple[str, int, bytes, str, str]]:
    """WARC bytes → pages-table rows (response/resource records only)."""
    rows = []
    for rec in parse_warc(data):
        h = rec["headers"]
        rtype = h.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue
        url = h.get("warc-target-uri", "")
        ts = _warc_ts_micros(h.get("warc-date", ""))
        body = _http_body(rec["body"]) if rtype == "response" else rec["body"]
        rows.append((url, ts, body, "", ""))
    return rows


def read_warc_pages(spark, path):
    """Read WARC file(s) into a pages DataFrame
    ``(url, warc_ts, html, text, lang)``.

    Narrow plan: binaryFile scan → mapInPandas fan-out; no shuffle.
    Feed the result straight to ``spark.job.run_extract``.
    """
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["content"]:
                out.extend(warc_to_page_rows(bytes(blob)))
            yield pd.DataFrame(
                out,
                columns=["url", "warc_ts_us", "html", "text", "lang"],
            )

    from pyspark.sql import functions as F

    raw = files.mapInPandas(
        expand,
        schema="url string, warc_ts_us long, html binary, text string, lang string",
    )
    # input_hint shape: warc_ts is a TIMESTAMP (converted JVM-side
    # from the exact epoch-micros the WARC-Date header parses to)
    return raw.select(
        "url",
        F.timestamp_micros("warc_ts_us").alias("warc_ts"),
        "html",
        "text",
        "lang",
    )


def write_warc(rows, compress: bool = False) -> bytes:
    """Serialize pages rows into a WARC archive (fixture/export path;
    deterministic, resource records)."""
    from datetime import datetime, timezone

    out = []
    for url, ts_micros, payload, _text, _lang in rows:
        ts = datetime.fromtimestamp(ts_micros / 1_000_000, tz=timezone.utc)
        head = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: resource" + CRLF
            + b"WARC-Target-URI: " + url.encode() + CRLF
            + b"WARC-Date: "
            + ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode() + CRLF
            + b"Content-Length: " + str(len(payload)).encode() + CRLF
            + CRLF
        )
        member = head + bytes(payload) + CRLF + CRLF
        if compress:
            c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            member = c.compress(member) + c.flush()
        out.append(member)
    return b"".join(out)
