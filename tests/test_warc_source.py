"""WARC source: record framing, gzip members, HTTP-response body
split, torn-record resync + error rows, size-classed file routing,
per-file lineage, Spark binaryFile → pages-table ingest, end-to-end
extraction."""

import pytest

from fixtures.gen import build_pages_rows
from pdf_parser_spark.engine import extract_document
from pdf_parser_spark.sources.warc import (
    parse_warc,
    warc_to_page_rows,
    warc_to_raw_rows,
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
    records, errors = parse_warc(blob)
    assert len(records) == 2 and not errors  # warcinfo seen by the scanner
    rows = warc_to_page_rows(blob)  # but only response becomes a row
    assert len(rows) == 1
    url, ts, html, _, _ = rows[0]
    assert url == "https://e.test/"
    assert ts == 1735689600_000000
    assert bytes(html) == b"<html>x</html>"


def test_malformed_tail_stops_cleanly():
    blob = write_warc(ROWS[:2]) + b"GARBAGE NOT A RECORD"
    records, errors = parse_warc(blob)
    assert len(records) == 2
    assert [e["kind"] for e in errors] == ["bad_magic"]


def test_torn_record_resyncs_to_next():
    """One torn record costs one record, not the rest of the archive."""
    blob = write_warc(ROWS[:4])
    # corrupt the SECOND member's Content-Length value (bad_length)
    first_len = len(write_warc(ROWS[:1]))
    torn = blob[:first_len] + blob[first_len:].replace(
        b"Content-Length:", b"Content-Length: x", 1
    )
    records, errors = parse_warc(torn)
    urls = [r["headers"]["warc-target-uri"] for r in records]
    assert urls == [u for u, *_ in (ROWS[0], ROWS[2], ROWS[3])]
    assert [e["kind"] for e in errors] == ["bad_length"]

    # truncated declared body at the tail
    short = write_warc(ROWS[:2])[:-20]
    records, errors = parse_warc(short)
    assert len(records) == 1
    assert [e["kind"] for e in errors] == ["truncated_body"]

    # header block never terminates
    headless = write_warc(ROWS[:1]) + b"WARC/1.0\r\nWARC-Type: response"
    records, errors = parse_warc(headless)
    assert len(records) == 1
    assert [e["kind"] for e in errors] == ["no_header_end"]


def test_raw_rows_carry_error_lineage():
    blob = write_warc(ROWS[:3]) + b"\xde\xad\xbe\xef"
    rows = warc_to_raw_rows(blob, src="s3://seg/a.warc")
    pages = [r for r in rows if r[7] is None]
    errs = [r for r in rows if r[7] is not None]
    assert len(pages) == 3 and len(errs) == 1
    assert all(r[5] == "s3://seg/a.warc" for r in rows)
    assert errs[0][7].startswith("bad_magic@")


@pytest.mark.parametrize("compress", [False, True])
def test_spark_ingest_and_extract(tmp_path, compress):
    pytest.importorskip("pyspark")
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


def test_spark_heavy_routing_and_lineage(tmp_path):
    """Skewed-WARC fixture: a giant archive rides its own repartitioned
    pass while small peers stay bin-packed, results identical either
    way, and lineage tallies torn records per source file."""
    pytest.importorskip("pyspark")
    from pdf_parser_spark.spark.session import build_session
    from pdf_parser_spark.sources.warc import (
        read_warc_pages,
        read_warc_raw,
        warc_lineage,
    )

    spark = build_session("warc-skew", master="local[4]", shuffle_partitions=8)
    try:
        # 3 small archives + 1 "giant" (scale-5 corpus, tiny heavy_bytes
        # so the routing boundary fires without GB fixtures)
        big_rows = build_pages_rows(5)
        (tmp_path / "small0.warc").write_bytes(write_warc(ROWS[:4]))
        (tmp_path / "small1.warc").write_bytes(write_warc(ROWS[4:8]))
        torn = write_warc(ROWS[8:10]) + b"JUNKJUNK"
        (tmp_path / "small2.warc").write_bytes(torn)
        (tmp_path / "giant.warc").write_bytes(write_warc(big_rows))
        heavy_bytes = (tmp_path / "small1.warc").stat().st_size + 1
        assert (tmp_path / "giant.warc").stat().st_size > heavy_bytes

        raw = read_warc_raw(spark, str(tmp_path), heavy_bytes=heavy_bytes)
        # the heavy branch is a repartition: exactly one Exchange, on the
        # heavy class only
        plan = raw._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan

        pages = read_warc_pages(spark, str(tmp_path), heavy_bytes=heavy_bytes)
        assert pages.count() == 10 + len(big_rows)

        lin = {r["src_file"]: r for r in warc_lineage(raw).collect()}
        assert len(lin) == 4
        small2 = next(v for k, v in lin.items() if k.endswith("small2.warc"))
        assert small2["page_rows"] == 2
        assert small2["torn_records"] == 1
        assert small2["errors"].startswith("bad_magic@")
        giant = next(v for k, v in lin.items() if k.endswith("giant.warc"))
        assert giant["page_rows"] == len(big_rows)
        assert giant["torn_records"] == 0
        assert giant["payload_bytes"] == sum(len(d) for _, _, d, _, _ in big_rows)
    finally:
        spark.stop()


# ---------------------------------------------------------------------------
# Totality fuzz: parse_warc is TOTAL — arbitrary bytes, bit-flipped
# real archives, and truncations always return (records, errors),
# never raise, and are deterministic (the per-file task contract: one
# corrupt archive must never kill an ingest task).
# ---------------------------------------------------------------------------


def _sample_blob(compress: bool) -> bytes:
    rows = [
        (f"https://w/{i}", 1_700_000_000_000_000 + i,
         b"<html><body>doc %d body text</body></html>" % i, "", "en")
        for i in range(6)
    ]
    return write_warc(rows, compress=compress)


def test_fuzz_parse_warc_total():
    import random

    rng = random.Random(20260818)
    for compress in (False, True):
        base = bytearray(_sample_blob(compress))
        for trial in range(60):
            mutated = bytearray(base)
            for _ in range(rng.randint(1, 10)):
                i = rng.randrange(len(mutated))
                mutated[i] ^= 1 << rng.randrange(8)
            if rng.random() < 0.3:
                mutated = mutated[: rng.randrange(len(mutated))]
            blob = bytes(mutated)
            r1 = parse_warc(blob)
            r2 = parse_warc(blob)
            assert isinstance(r1, tuple) and len(r1) == 2, (compress, trial)
            records, errors = r1
            assert all(isinstance(e["kind"], str) for e in errors)
            assert (records, errors) == r2  # deterministic
        # pure garbage
        for trial in range(40):
            blob = bytes(rng.getrandbits(8) for _ in range(rng.randrange(2048)))
            records, errors = parse_warc(blob)
            assert isinstance(records, list) and isinstance(errors, list)
