"""Byte-identity against the COMPILED reference binary.

The strongest correctness evidence the north rule asks for: the
actual Rust CLI (built offline by scripts/build_reference_oracle.py,
deps shimmed without touching extraction semantics) is run over every
fixture PDF in every output format and its stdout compared
byte-for-byte with our engine.

CLI-vs-library deltas modeled exactly:
* the CLI prints via ``println!`` → one trailing newline on stdout
  (main.rs:162);
* the CLI skips pages that fail to extract (main.rs:145-147) while
  lib.rs (our semantic target) propagates the error — so when our
  engine raises a PdfError for a single-page doc, the CLI's expected
  stdout is the empty output + newline.
"""

import os
import subprocess
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.gen import build_pdf_corpus  # noqa: E402
from pdf_parser_spark.engine import api  # noqa: E402
from pdf_parser_spark.engine.errors import PdfError  # noqa: E402

FLAG = {
    "txt": "--txt",
    "md": "--md",
    "csv": "--csv",
    "tsv": "--tsv",
    "text": "--text",
    "raw": "--raw",
}
FN = {
    "txt": api.pdf_to_text,
    "md": api.pdf_to_markdown,
    "csv": api.pdf_to_csv,
    "tsv": api.pdf_to_tsv,
    "text": api.pdf_to_aligned_text,
    "raw": api.pdf_to_raw_spans,
}


@pytest.fixture(scope="module")
def ref_bin():
    from scripts.build_reference_oracle import build

    path = build()
    if path is None:
        pytest.skip("rust toolchain / reference not available")
    return path


@pytest.fixture(scope="module")
def corpus():
    return build_pdf_corpus()


@pytest.mark.parametrize("fmt", sorted(FLAG))
def test_byte_identity_vs_reference_binary(fmt, ref_bin, corpus):
    for cid, data in corpus.items():
        with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            r = subprocess.run(
                [ref_bin, path, FLAG[fmt]], capture_output=True, timeout=120
            )
            try:
                ours = FN[fmt](data) + "\n"
            except PdfError:
                ours = None
            if r.returncode != 0:
                # document-level failure in the reference → ours must
                # have failed too (malformed corpus cases)
                assert ours is None, (cid, fmt, r.stderr[:200])
                continue
            ref = r.stdout.decode("utf-8")
            if ours is None:
                ours = "\n"  # CLI page-skip path: empty output
            assert ref == ours, (cid, fmt, ref[:80], ours[:80])
        finally:
            os.unlink(path)


@pytest.mark.parametrize("fmt", sorted(FLAG))
def test_page_scoped_byte_identity_vs_reference_binary(fmt, ref_bin, corpus):
    """``--page N`` in every format (main.rs:14, 45-52, 88-96): every
    valid page of every multi-page fixture byte-identical; out-of-range
    (0 and n+1) exits 1 with the CLI's error line, mirrored by
    PageRangeError carrying the same message."""
    for cid in ("multipage-nested", "heavy-tail", "incremental-prev"):
        data = corpus[cid]
        n = api.pdf_page_count(data)
        with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            pages = [1, n] if cid == "heavy-tail" else list(range(1, n + 1))
            for p in pages:
                r = subprocess.run(
                    [ref_bin, path, FLAG[fmt], "--page", str(p)],
                    capture_output=True, timeout=120,
                )
                assert r.returncode == 0, (cid, fmt, p, r.stderr[:200])
                ours = api.pdf_extract(data, fmt, page=p) + "\n"
                assert r.stdout.decode("utf-8") == ours, (cid, fmt, p)
            for bad in (0, n + 1):
                r = subprocess.run(
                    [ref_bin, path, FLAG[fmt], "--page", str(bad)],
                    capture_output=True, timeout=120,
                )
                assert r.returncode != 0, (cid, fmt, bad)
                with pytest.raises(api.PageRangeError) as ei:
                    api.pdf_extract(data, fmt, page=bad)
                assert str(ei.value) in r.stderr.decode("utf-8"), (cid, bad)
        finally:
            os.unlink(path)


def test_pdf_page_to_csv_matches_cli_page(corpus):
    """wasm.rs:79-97: 0-indexed single-page CSV == the CLI's 1-indexed
    --page N --csv output."""
    for cid in ("multipage-nested", "table-page"):
        data = corpus[cid]
        for idx in range(api.pdf_page_count(data)):
            assert api.pdf_page_to_csv(data, idx) == api.pdf_extract(
                data, "csv", page=idx + 1
            )


def test_cli_extract_matches_format_functions(corpus):
    """pdf_extract(page=None) must equal the lib.rs-mirror functions
    on every non-erroring fixture in every format."""
    from pdf_parser_spark.engine.errors import PdfError

    for cid, data in corpus.items():
        for fmt, fn in FN.items():
            try:
                expect = fn(data)
            except PdfError:
                continue
            assert api.pdf_extract(data, fmt) == expect, (cid, fmt)


def test_page_count_vs_reference(ref_bin, corpus):
    """--page N validation doubles as a page-count oracle: page
    page_count is accepted, page_count+1 is rejected (main.rs:85-97).
    """
    for cid in ("multipage-nested", "xrefstream-objstm", "incremental-prev"):
        data = corpus[cid]
        n = api.pdf_page_count(data)
        with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            ok = subprocess.run(
                [ref_bin, path, "--txt", "--page", str(n)],
                capture_output=True, timeout=60,
            )
            over = subprocess.run(
                [ref_bin, path, "--txt", "--page", str(n + 1)],
                capture_output=True, timeout=60,
            )
            assert ok.returncode == 0, (cid, n, ok.stderr[:200])
            assert over.returncode != 0, (cid, n)
        finally:
            os.unlink(path)
