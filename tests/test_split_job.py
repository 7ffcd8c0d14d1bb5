"""Split job: the val table must contain no LSH near-duplicate of any
train row (the leakage invariant), every input row must land in
exactly one side, and the summary must account for the quarantine."""

import json
import os
import subprocess
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from jobs.split import split_corpus  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("split-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _corpus(spark, n=80):
    # every doc i has an exact twin under a different url — near-dup
    # pairs that straddle any hash split and MUST not straddle ours
    rows = []
    for i in range(n):
        text = " ".join(f"tok{i}w{j} common{j % 3}" for j in range(10))
        rows.append((f"https://t/a{i}", text))
        rows.append((f"https://t/b{i}", text))
    # plus short rows that cannot shingle (stay in their hash split)
    rows += [(f"https://t/short{i}", "tiny") for i in range(5)]
    return spark.createDataFrame(rows, "url string, text_extracted string")


def test_split_val_is_leak_free(spark):
    df = _corpus(spark)
    train, val, summary, cleanup = split_corpus(df)

    n_train, n_val = train.count(), val.count()
    assert n_train + n_val == df.count() == summary["rows"]
    assert n_val == summary["val_final"]
    assert summary["val_hash_assigned"] == summary["val_final"] + summary[
        "val_leaked_reassigned_to_train"
    ]
    # the corpus is twins-by-construction: a plain 1/10 hash split
    # must have leaked SOMETHING for this test to mean anything
    assert summary["val_leaked_reassigned_to_train"] > 0

    # the invariant: no val text equals any train text (exact twins
    # share every band, so LSH-level leakage implies text-level here)
    val_texts = {r.text_extracted for r in val.collect()}
    train_texts = {r.text_extracted for r in train.collect()}
    overlap = {t for t in val_texts & train_texts if len(t.split()) >= 3}
    assert not overlap, sorted(overlap)[:3]

    # releasing the id cache must not invalidate the returned frames
    cleanup()
    assert train.count() == n_train and val.count() == n_val


def test_split_cli_end_to_end(spark, tmp_path):
    inp = str(tmp_path / "curated")
    out = str(tmp_path / "split")
    _corpus(spark, n=30).write.parquet(inp)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "jobs", "split.py"),
         "--input", inp, "--output", out, "--master", "local[2]"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_GRAFT_CPUS": "2"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.load(open(f"{out}/split.json"))
    tr = spark.read.parquet(f"{out}/train")
    va = spark.read.parquet(f"{out}/val")
    assert tr.count() + va.count() == summary["rows"]
    assert va.count() == summary["val_final"]
    assert not set(r.url for r in tr.select("url").collect()) & set(
        r.url for r in va.select("url").collect()
    )
