"""WARC source: record framing, gzip members, HTTP-response body
split, Spark binaryFile → pages-table ingest, end-to-end extraction."""

import pytest

from fixtures.gen import build_pages_rows
from pdf_parser_spark.engine import extract_document
from pdf_parser_spark.sources.warc import (
    parse_warc,
    warc_to_page_rows,
    write_warc,
)

ROWS = build_pages_rows(1)[:10]


def test_roundtrip_plain():
    blob = write_warc(ROWS)
    got = warc_to_page_rows(blob)
    assert [(u, ts) for u, ts, *_ in got] == [
        (u, (ts // 1_000_000) * 1_000_000) for u, ts, *_ in ROWS
    ]
    assert [bytes(h) for _, _, h, _, _ in got] == [bytes(h) for _, _, h, _, _ in ROWS]


def test_roundtrip_gzip_members():
    blob = write_warc(ROWS, compress=True)
    assert blob[:2] == b"\x1f\x8b"
    got = warc_to_page_rows(blob)
    assert len(got) == len(ROWS)
    assert [bytes(h) for _, _, h, _, _ in got] == [bytes(h) for _, _, h, _, _ in ROWS]


def test_response_record_http_split_and_skips():
    payload = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>x</html>"
    blob = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://e.test/\r\n"
        b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )
    assert len(parse_warc(blob)) == 2  # warcinfo seen by the scanner
    rows = warc_to_page_rows(blob)  # but only response becomes a row
    assert len(rows) == 1
    url, ts, html, _, _ = rows[0]
    assert url == "https://e.test/"
    assert ts == 1735689600_000000
    assert bytes(html) == b"<html>x</html>"


def test_malformed_tail_stops_cleanly():
    blob = write_warc(ROWS[:2]) + b"GARBAGE NOT A RECORD"
    assert len(parse_warc(blob)) == 2


@pytest.mark.parametrize("compress", [False, True])
def test_spark_ingest_and_extract(tmp_path, compress):
    pyspark = pytest.importorskip("pyspark")
    from pdf_parser_spark.spark.job import run_extract
    from pdf_parser_spark.spark.session import build_session
    from pdf_parser_spark.sources.warc import read_warc_pages

    spark = build_session("warc-tests", master="local[4]", shuffle_partitions=8)
    try:
        ext = "warc.gz" if compress else "warc"
        # two archives -> two binaryFile rows -> fan-out to page rows
        (tmp_path / f"a.{ext}").write_bytes(write_warc(ROWS[:6], compress))
        (tmp_path / f"b.{ext}").write_bytes(write_warc(ROWS[6:], compress))
        pages = read_warc_pages(spark, str(tmp_path))
        got = {r["url"]: r for r in pages.collect()}
        assert len(got) == len(ROWS)

        extracted = run_extract(pages, threshold=100_000)
        texts = {r["url"]: r["text_extracted"] for r in extracted.collect()}
        for url, _, data, _, _ in ROWS:
            assert texts[url] == extract_document(data)["text"], url
    finally:
        spark.stop()
