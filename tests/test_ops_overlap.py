"""sketch_overlap: theta-sketch batch-novelty estimates."""

import os
import sys

import duckdb
import pytest

pyspark = pytest.importorskip("pyspark")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.ops.overlap import (  # noqa: E402
    PPM,
    sketch_overlap,
)
from pdf_parser_spark.ops.sketches import HASH_SPACE, KMV_K  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session(
        "overlap-tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


def _exact(sf_dir):
    """Ground-truth per-lang distinct-3-gram sets per side."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH toks AS (
          SELECT doc_id, lang,
                 list_filter(string_split(text, ' '), t -> t <> '') AS tok
          FROM read_parquet('{sf_dir}/documents.parquet')
        )
        SELECT lang, doc_id % 5 = 0 AS is_new, g.gram
        FROM toks, unnest([array_to_string(tok[i:i+2], ' ')
                           for i in generate_series(1, len(tok) - 2)]) AS g(gram)
        WHERE len(tok) >= 3
        """
    ).fetchall()
    sets: dict = {}
    for lang, is_new, gram in rows:
        sets.setdefault((lang, bool(is_new)), set()).add(gram)
    return sets


def test_estimates_track_exact_ground_truth(spark):
    got = {r["lang"]: r for r in sketch_overlap(spark, SF_DIR).collect()}
    sets = _exact(SF_DIR)
    langs = {k[0] for k in sets}
    assert set(got) == langs
    for lang in langs:
        new = sets.get((lang, True), set())
        old = sets.get((lang, False), set())
        r = got[lang]
        scale = HASH_SPACE // r["theta"]  # per-hash scale factor
        # Per-side counts: the sketch IS the set below K, so the exact
        # branch must be EXACT; above K it's the (K-1)/kth KMV
        # estimator, sigma ~ 1/sqrt(K-2) -> generous 50% band.
        for est, exact in (
            (r["est_new"], len(new)),
            (r["est_old"], len(old)),
        ):
            if exact < KMV_K:
                assert est == exact, (lang, est, exact)
            else:
                assert abs(est - exact) <= exact // 2, (lang, est, exact)
        # Union/intersection scale by theta = min(theta_new, theta_old):
        # exact only when BOTH sides are exact (scale == 1).  The
        # intersection's resolution floor is one hash = `scale` grams,
        # so a true intersection of ~scale grams legitimately estimates
        # 0 — band by the sampling scale, not the exact value.
        ue, ie = len(new | old), len(new & old)
        if scale == 1:
            assert r["est_union"] == ue, (lang, r["est_union"], ue)
            assert r["est_intersection"] == ie
        else:
            assert abs(r["est_union"] - ue) <= max(3, ue // 2)
            assert abs(r["est_intersection"] - ie) <= 3 * scale + ie // 2, (
                lang,
                r["est_intersection"],
                ie,
                scale,
            )
        if r["est_union"] > 0:
            assert r["jaccard_ppm"] == (
                r["est_intersection"] * PPM // r["est_union"]
            )


def test_exact_branch_small_corpus(spark, tmp_path):
    # every side < K distinct grams -> all estimates are exact counts
    a = "one two three four five six"              # 4 grams
    b = "one two three seven eight nine"           # 4 grams, 1 shared
    df = spark.createDataFrame(
        [
            (0, a, "en", "s", len(a)),   # new side (0 % 5 == 0)
            (1, b, "en", "s", len(b)),   # old side
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    r = sketch_overlap(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["est_new"] == 4 and row["est_old"] == 4
    assert row["est_union"] == 7 and row["est_intersection"] == 1
    assert row["jaccard_ppm"] == PPM // 7
