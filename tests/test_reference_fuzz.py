"""Seeded differential fuzzing against the compiled reference binary.

Generates randomized (but fully deterministic, seed-fixed) PDFs across
the supported feature envelope — the full text-positioning operator
set, literal/hex strings with escapes and octal, WinAnsi/MacRoman
encodings, multi-font pages, Flate compression, multi-page trees —
and asserts byte-identical output vs the Rust CLI in all six formats.
Far more state-space coverage than the 25 curated fixtures.

On failure the test prints the seed and the PDF hex for direct repro.
"""

import os
import random
import subprocess
import sys
import tempfile
import zlib

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fixtures.gen import PdfBuilder  # noqa: E402
from pdf_parser_spark.engine import api  # noqa: E402
from pdf_parser_spark.engine.errors import PdfError  # noqa: E402
from tests.test_reference_binary import FLAG, FN  # noqa: E402

N_DOCS = 250
SEED = 20260817


@pytest.fixture(scope="module")
def ref_bin():
    from scripts.build_reference_oracle import build

    path = build()
    if path is None:
        pytest.skip("rust toolchain / reference not available")
    return path


def _fmt_num(rng: random.Random) -> bytes:
    """Lexer-compatible number: optional sign, digits, ≤1 decimal
    point, no exponent."""
    if rng.random() < 0.5:
        return str(rng.randint(-900, 900)).encode()
    return f"{rng.uniform(-900, 900):.{rng.randint(1, 3)}f}".encode()


def _pos_num(rng: random.Random, lo=0, hi=800) -> bytes:
    if rng.random() < 0.5:
        return str(rng.randint(lo, hi)).encode()
    return f"{rng.uniform(lo, hi):.{rng.randint(1, 2)}f}".encode()


_WORDS = [b"alpha", b"Beta", b"GAMMA42", b"delta-x", b"Total:", b"19.99",
          b"foo_bar", b"q", b"XY", b"end."]


def _literal_string(rng: random.Random) -> bytes:
    parts = []
    for _ in range(rng.randint(0, 5)):
        c = rng.random()
        if c < 0.50:
            parts.append(rng.choice(_WORDS))
        elif c < 0.62:
            parts.append(rng.choice([rb"\(", rb"\)", rb"\\", rb"\n", rb"\t",
                                     rb"\r", rb"\b", rb"\f"]))
        elif c < 0.70:
            # octal escapes: 1-3 digits, including overflow-ish values
            parts.append(rng.choice([b"\\%03o" % rng.randint(0, 255),
                                     b"\\%o" % rng.randint(0, 7),
                                     b"\\41"]))
        elif c < 0.76:
            parts.append(bytes([rng.randint(0xA0, 0xFE)]))  # high byte
        elif c < 0.82:
            parts.append(b"\\\n")  # line continuation: escaped newline dropped
        elif c < 0.92:
            parts.append(b" ")
        else:
            parts.append(b"(nested)")  # balanced parens are legal
    return b"(" + b"".join(parts) + b")"


def _hex_string(rng: random.Random) -> bytes:
    n = rng.randint(1, 8)
    body = "".join(f"{rng.randint(0x20, 0xFE):02X}" for _ in range(n))
    if rng.random() < 0.3:  # whitespace inside hex strings is legal
        mid = len(body) // 2
        body = body[:mid] + " " + body[mid:]
    if rng.random() < 0.2:  # odd length pads with 0
        body = body[:-1]
    return b"<" + body.encode() + b">"


def _string(rng: random.Random) -> bytes:
    return _hex_string(rng) if rng.random() < 0.25 else _literal_string(rng)


def _content_stream(rng: random.Random, fonts: list[bytes]) -> bytes:
    ops: list[bytes] = []
    n_blocks = rng.randint(1, 3)
    for _ in range(n_blocks):
        ops.append(b"BT")
        ops.append(b"/%s %s Tf" % (rng.choice(fonts), _pos_num(rng, 6, 30)))
        ops.append(b"%s %s Td" % (_pos_num(rng, 20, 500), _pos_num(rng, 20, 760)))
        for _ in range(rng.randint(1, 12)):
            c = rng.random()
            if c < 0.30:
                ops.append(_string(rng) + b" Tj")
            elif c < 0.42:
                items = []
                for _ in range(rng.randint(1, 5)):
                    if rng.random() < 0.5:
                        items.append(_string(rng))
                    else:
                        items.append(_fmt_num(rng) if rng.random() < 0.5
                                     else str(rng.choice([-2000, -500, -150, 150,
                                                          300, 2500])).encode())
                ops.append(b"[" + b" ".join(items) + b"] TJ")
            elif c < 0.52:
                ops.append(b"%s %s Td" % (_fmt_num(rng), _fmt_num(rng)))
            elif c < 0.60:
                ops.append(b"%s %s TD" % (_fmt_num(rng), _fmt_num(rng)))
            elif c < 0.68:
                ops.append(b" ".join(_fmt_num(rng) for _ in range(6)) + b" Tm")
            elif c < 0.74:
                ops.append(b"T*")
            elif c < 0.79:
                ops.append(b"%s TL" % _pos_num(rng, 1, 40))
            elif c < 0.83:
                ops.append(b"%s Tc" % _fmt_num(rng))
            elif c < 0.86:
                ops.append(b"%s Tw" % _fmt_num(rng))
            elif c < 0.90:
                ops.append(b"q")
            elif c < 0.94:
                ops.append(b"Q")
            elif c < 0.97:
                ops.append(_string(rng) + b" '")
            else:
                ops.append(b"%s %s %s \"" % (_fmt_num(rng), _fmt_num(rng),
                                             _string(rng)))
            if rng.random() < 0.15:
                ops.append(b"/%s %s Tf" % (rng.choice(fonts),
                                           _pos_num(rng, 6, 30)))
            if rng.random() < 0.12:
                # non-text operators the interpreter must skip, incl.
                # inline dicts (skip_dict, content/parser.rs:467-488)
                ops.append(rng.choice([
                    b"0.5 0.2 0.9 rg",
                    b"1 0 0 1 10 20 cm",
                    b"2 w",
                    b"/GS0 gs",
                    b"/P << /MCID 3 >> BDC",
                    b"EMC",
                    b"% a comment to end of line\n",
                ]))
        ops.append(b"ET")
    return b" ".join(ops)


ENCODINGS = [b"", b" /Encoding /WinAnsiEncoding", b" /Encoding /MacRomanEncoding"]


def gen_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    n_pages = rng.randint(1, 3)
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(n_pages))
    b.add(2, b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages))

    fonts = [b"F1", b"F2"]
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
          % rng.choice(ENCODINGS))
    res = b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >>"

    for i in range(n_pages):
        content = _content_stream(rng, fonts)
        c = rng.random()
        if c < 0.35:
            payload = zlib.compress(content)
            filters = b"/FlateDecode"
        elif c < 0.50:
            payload = content.hex().upper().encode() + b">"
            filters = b"/ASCIIHexDecode"
        elif c < 0.60:
            # chain applied in array order: hex-decode then inflate
            payload = zlib.compress(content).hex().upper().encode() + b">"
            filters = b"[/ASCIIHexDecode /FlateDecode]"
        else:
            payload, filters = content, None
        b.add(10 + i, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              b"/Contents %d 0 R %s >>" % (30 + i, res))
        b.add_stream(30 + i, b"", payload, filters)
    return b.build()


def test_fuzz_byte_identity(ref_bin):
    rng = random.Random(SEED)
    diffs = []
    for doc_i in range(N_DOCS):
        data = gen_pdf(rng)
        with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
            f.write(data)
            path = f.name
        try:
            for fmt, flag in FLAG.items():
                r = subprocess.run(
                    [ref_bin, path, flag], capture_output=True, timeout=60
                )
                try:
                    ours = FN[fmt](data) + "\n"
                except PdfError:
                    ours = None
                if r.returncode != 0:
                    if ours is not None:
                        diffs.append((doc_i, fmt, "ref-failed", r.stderr[:120]))
                    continue
                ref = r.stdout.decode("utf-8", "replace")
                if ours is None:
                    ours = "\n"
                if ref != ours:
                    k = next(
                        (j for j in range(min(len(ref), len(ours)))
                         if ref[j] != ours[j]),
                        min(len(ref), len(ours)),
                    )
                    diffs.append(
                        (doc_i, fmt, f"at {k}", repr(ref[k - 30 : k + 30]),
                         repr(ours[k - 30 : k + 30]))
                    )
        finally:
            os.unlink(path)
        if diffs:
            sys.stderr.write(f"repro: seed={SEED} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
            break
    assert not diffs, diffs[:5]
