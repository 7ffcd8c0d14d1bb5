"""text_script_detect: Unicode script-mix profiling."""

import os
import re
import sys

import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.scriptmix import (  # noqa: E402
    MIXED_MIN_PPM,
    SCRIPT_CLASSES,
    SNIPPETS,
    text_script_detect,
)

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

# Python twins of the five counted classes
_PY_CLASSES = {
    "latin": re.compile(r"[A-Za-z]"),
    "cyrillic": re.compile("[Ѐ-ӿ]"),
    "greek": re.compile("[Ͱ-Ͽ]"),
    "cjk": re.compile("[一-鿿]"),
    "arabic": re.compile("[؀-ۿ]"),
}


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "scriptmix-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="module")
def rows(spark):
    return {
        r["doc_id"]: r for r in text_script_detect(spark, SF_DIR).collect()
    }


@pytest.fixture(scope="module")
def texts(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return {r["doc_id"]: r["text"] for r in df.select("doc_id", "text").collect()}


def test_counts_match_python(rows, texts):
    for did, r in rows.items():
        aug = texts[did] + SNIPPETS[did % 5]
        total = 0
        for name in _PY_CLASSES:
            n = len(_PY_CLASSES[name].findall(aug))
            assert r[f"n_{name}"] == n, (did, name)
            total += n
        assert r["n_letters"] == total


def test_dominant_and_mixed_match_python(rows):
    order = [name for name, _, _ in SCRIPT_CLASSES]
    for r in rows.values():
        counts = {n: r[f"n_{n}"] for n in order}
        best = max(order, key=lambda n: (counts[n], -order.index(n)))
        assert r["dominant_script"] == best
        total = r["n_letters"]
        assert r["dominant_ppm"] == counts[best] * 1_000_000 // total
        second = max(
            (counts[n] for n in order if n != best), default=0
        )
        assert r["mixed_script"] == (
            second * 1_000_000 // total >= MIXED_MIN_PPM
        )


def test_exact_tie_counts_as_mixed(spark, tmp_path):
    """A 50/50 Latin/Cyrillic doc is maximally mixed; the dominant
    class must be excluded from the second-share computation BY NAME,
    not by count value, or the tie zeroes both."""
    rows = [(0, "abc абв")]  # 3 Latin letters, 3 Cyrillic letters
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    r = text_script_detect(spark, str(tmp_path)).collect()[0]
    assert r["n_latin"] == 3 and r["n_cyrillic"] == 3
    assert r["dominant_script"] == "latin"  # priority order breaks ties
    assert r["mixed_script"]


def test_snippet_slots_profile_as_expected(rows):
    """Slot 0 is pure Latin; each other slot mixes its script in."""
    slot_script = ["latin", "cyrillic", "greek", "cjk", "arabic"]
    for did, r in rows.items():
        slot = did % 5
        if slot == 0:
            assert r["dominant_script"] == "latin"
            assert not r["mixed_script"]
            assert r["dominant_ppm"] == 1_000_000
        else:
            # the base text keeps Latin dominant but the snippet must
            # register its own class
            assert r[f"n_{slot_script[slot]}"] > 0
            assert r["dominant_script"] == "latin"
    # the injected-script docs are flagged mixed whenever the snippet
    # clears the 5% bar (short docs) — at least some must
    assert any(r["mixed_script"] for r in rows.values())
