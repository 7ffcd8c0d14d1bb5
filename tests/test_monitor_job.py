"""Recrawl monitor job (jobs/monitor.py): end-to-end drain + freshness
report over a two-crawl landing directory."""

import datetime
import json
import os
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_T0 = datetime.datetime(2025, 1, 1)
_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def test_monitor_job_end_to_end(tmp_path, monkeypatch):
    from pdf_parser_spark.spark.session import build_session

    inp = tmp_path / "in"
    out = tmp_path / "out"
    cp = tmp_path / "cp"

    spark = build_session("monitor-job-prep", master="local[4]",
                          shuffle_partitions=8)
    rows0 = [(f"u{i}", _T0, bytearray(b"v1"), "", "en") for i in range(5)]
    later = _T0 + datetime.timedelta(hours=48)
    rows1 = [
        (f"u{i}", later, bytearray(b"v2" if i % 2 else b"v1"), "", "en")
        for i in range(3)
    ]
    spark.createDataFrame(rows0, _SCHEMA).coalesce(1).write.parquet(
        str(inp / "f0")
    )
    spark.createDataFrame(rows1, _SCHEMA).coalesce(1).write.parquet(
        str(inp / "f1")
    )

    import jobs.monitor as monitor

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "monitor.py",
            "--input", f"{inp}/*/",
            "--output", str(out),
            "--checkpoint", str(cp),
            "--ttl-hours", "24",
            "--master", "local[4]",
        ],
    )
    monitor.main()

    summary = json.load(open(out / "monitor.json"))
    # crawl 2 recrawls u0..u2 48h later: u0/u2 unchanged, u1 changed;
    # u3/u4 missed the 24h window -> stale
    assert summary["urls"] == 5
    assert summary["by_status"] == {"changed": 1, "unchanged": 2, "stale": 2}

    spark2 = build_session("monitor-job-check", master="local[4]",
                           shuffle_partitions=8)
    latest = {
        r.url: r.status
        for r in spark2.read.parquet(str(out / "latest")).collect()
    }
    assert latest == {
        "u0": "unchanged", "u1": "changed", "u2": "unchanged",
        "u3": "stale", "u4": "stale",
    }
    spark2.stop()
