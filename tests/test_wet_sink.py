"""WET export sink: write extracted text as CC-style conversion
records, round-trip through our own WARC reader (url/ts/text
identical, html NULL), deterministic bytes under a fixed partitioning,
and lineage tallies that match the input."""

import datetime
import glob
import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pdf_parser_spark.sources.warc import parse_warc, read_warc_pages  # noqa: E402
from pdf_parser_spark.sources.wet import wet_record, write_wet_files  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("wet-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _pages(spark):
    tz = datetime.timezone.utc
    rows = [
        (f"https://t.example/p/{i}",
         datetime.datetime(2025, 1, 1, 0, 0, i % 60, i * 137 % 1_000_000,
                           tzinfo=tz),
         None,
         f"doc {i} text café 日本語 line\nsecond line" if i % 7 else "",
         "en")
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )


def test_wet_roundtrip_through_warc_reader(spark, tmp_path):
    out = str(tmp_path / "wet")
    pages = _pages(spark).repartition(3, "url")
    lineage = write_wet_files(pages, out).collect()
    assert sum(r.n_records for r in lineage) == 40
    assert all(r.file.endswith(".warc.wet.gz") for r in lineage)

    back = read_warc_pages(spark, out).collect()
    want = {(r.url, r.warc_ts, r.text) for r in _pages(spark).collect()}
    got = {(r.url, r.warc_ts, r.text) for r in back}
    assert got == want
    assert all(r.html is None for r in back)


def test_wet_files_are_deterministic(spark, tmp_path):
    pages = _pages(spark).repartition(2, "url")
    outs = []
    for d in ("a", "b"):
        out = str(tmp_path / d)
        write_wet_files(pages, out).collect()
        outs.append({
            os.path.basename(p): open(p, "rb").read()
            for p in glob.glob(f"{out}/*")
        })
    assert outs[0] == outs[1] and outs[0]


def test_wet_record_framing_and_uncompressed_mode(spark, tmp_path):
    rec = wet_record("https://x.example/a", 1_735_689_600_123_456, "hé\nllo")
    records, errors = parse_warc(rec * 3)
    assert not errors and len(records) == 3
    h = records[0]["headers"]
    assert h["warc-type"] == "conversion"
    assert records[0]["body"].decode("utf-8") == "hé\nllo"

    out = str(tmp_path / "plain")
    lineage = write_wet_files(
        _pages(spark).coalesce(1), out, compress=False
    ).collect()
    files = glob.glob(f"{out}/*")
    assert len(files) == 1 and files[0].endswith(".warc.wet")
    recs, errs = parse_warc(open(files[0], "rb").read())
    assert not errs and len(recs) == lineage[0].n_records == 40


def test_wet_empty_partitions_emit_no_file(spark, tmp_path):
    out = str(tmp_path / "sparse")
    pages = _pages(spark).limit(1).repartition(8)
    lineage = write_wet_files(pages, out).collect()
    assert sum(r.n_records for r in lineage) == 1
    assert len(glob.glob(f"{out}/*")) == len(lineage) <= 2


def test_wet_record_timestamp_exact_at_extreme_epochs():
    """Write-side WARC-Date must round-trip to the exact input micros
    through the read side's integer parser, including timestamps large
    enough that float fromtimestamp() misrounds (>= ~2^33 s)."""
    from pdf_parser_spark.sources.warc import _warc_ts_micros

    for ts in (0, 1, 999_999, 1_735_689_600_123_456,
               4_000_000_000_000_001,      # just past the old fuzz bound
               9_007_199_254_740_993,      # 2^53+1: unrepresentable as f64
               250_000_000_000_000_000):   # year ~9892
        rec = wet_record("https://x.example/t", ts, "x")
        date = next(
            line.split(b": ", 1)[1].decode()
            for line in rec.split(b"\r\n")
            if line.startswith(b"WARC-Date:")
        )
        assert _warc_ts_micros(date) == ts, (ts, date)


def test_wet_run_token_namespaces_and_idempotent_retry(spark, tmp_path):
    out = str(tmp_path / "runs")
    pages = _pages(spark).repartition(2, "url")
    lin1 = write_wet_files(pages, out, run_token="snap-1").collect()
    lin2 = write_wet_files(pages, out, run_token="snap-2").collect()
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out}/*"))
    assert all(n.startswith(("snap-1-part-", "snap-2-part-")) for n in names)
    assert len(names) == len(lin1) + len(lin2)
    # a retry of the same token (task retry after a crash between
    # os.replace and task commit) must be idempotent: the already
    # published files are left untouched and the SAME lineage rows
    # come back, instead of a permanent FileExistsError
    before = {
        p: open(p, "rb").read() for p in glob.glob(f"{out}/snap-1-part-*")
    }
    lin1b = write_wet_files(pages, out, run_token="snap-1").collect()
    assert sorted(map(tuple, lin1b)) == sorted(map(tuple, lin1))
    after = {
        p: open(p, "rb").read() for p in glob.glob(f"{out}/snap-1-part-*")
    }
    assert after == before
    # no torn temp files left behind by the retried run
    assert not [n for n in glob.glob(f"{out}/*") if ".inprogress-" in n]


@pytest.mark.parametrize("compress", [False, True])
def test_wet_record_roundtrip_property(compress):
    from hypothesis import given, settings, strategies as st

    from pdf_parser_spark.sources.wet import _gzip_member

    @settings(max_examples=150, deadline=None)
    @given(
        url=st.text(
            alphabet=st.characters(blacklist_categories=("Cs",),
                                   blacklist_characters="\r\n"),
            max_size=60,
        ),
        ts=st.integers(min_value=0, max_value=4_000_000_000_000_000),
        text=st.one_of(st.none(), st.text(max_size=300)),
    )
    def check(url, ts, text):
        rec = wet_record(url, ts, text)
        blob = _gzip_member(rec) if compress else rec
        records, errors = parse_warc(blob)
        assert not errors and len(records) == 1
        h = records[0]["headers"]
        assert h["warc-type"] == "conversion"
        assert records[0]["body"].decode("utf-8") == (text or "")

    check()
