"""End-to-end curation funnel over extracted pages: decode-error
drop, quality floor, exact dedup (min-url keeper), MinHash-LSH
near-dup collapse, and the funnel lineage report."""

import datetime

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from jobs.curate import curate  # noqa: E402
from pdf_parser_spark.spark.job import run_extract  # noqa: E402
from pdf_parser_spark.streaming.job import PAGES_STREAM_SCHEMA  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("curate-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


_TS = datetime.datetime(2025, 1, 1)

_LONG = " ".join(f"tok{i % 37} word{i % 11} filler" for i in range(120))


_LONG2 = " ".join(f"alpha{i % 29} beta{i % 13} gamma" for i in range(120))


def _pages(spark):
    dup = b"<html><body><p>" + _LONG2.encode() + b"</p></body></html>"
    rows = [
        # exact-dup pair: identical bytes, two urls -> min url survives
        ("https://t/dup-a", _TS, bytearray(dup), "", "en"),
        ("https://t/dup-b", _TS, bytearray(dup), "", "en"),
        # near-dup pair: long html, one with a token dropped
        ("https://t/near-a", _TS, bytearray(
            b"<html><body><p>" + _LONG.encode() + b"</p></body></html>"), "", "en"),
        ("https://t/near-b", _TS, bytearray(
            b"<html><body><p>" + _LONG.split(" ", 1)[1].encode() + b"</p></body></html>"), "", "en"),
        # unique long doc: must survive everything
        ("https://t/unique", _TS, bytearray(
            b"<html><body><p>completely different content about spark "
            b"partitioning strategies and shuffle economics at scale "
            b"with many distinct informative words</p></body></html>"), "", "en"),
        # quality reject: 3 tokens
        ("https://t/short", _TS, bytearray(
            b"<html><body><p>too short here</p></body></html>"), "", "en"),
        # decode reject: malformed pdf
        ("https://t/broken", _TS, bytearray(b"%PDF-1.4\ngarbage"), "", "en"),
    ]
    return spark.createDataFrame(rows, PAGES_STREAM_SCHEMA)


def test_curate_funnel(spark):
    extracted = run_extract(_pages(spark), fmt="txt", threshold=100_000)
    curated, funnel = curate(extracted)
    urls = {r.url for r in curated.select("url").collect()}

    assert "https://t/dup-a" in urls and "https://t/dup-b" not in urls
    assert "https://t/near-a" in urls and "https://t/near-b" not in urls
    assert "https://t/unique" in urls
    assert "https://t/short" not in urls
    assert "https://t/broken" not in urls

    stages = {f["stage"]: f["rows"] for f in funnel}
    assert stages["input"] == 7
    assert stages["decoded"] == 6        # broken dropped
    assert stages["quality"] == 5        # short dropped
    assert stages["exact_dedup"] == 4    # dup-b dropped
    assert stages["near_dedup"] == 3     # near-b dropped
    # funnel is monotone non-increasing
    rows = [f["rows"] for f in funnel]
    assert rows == sorted(rows, reverse=True)
