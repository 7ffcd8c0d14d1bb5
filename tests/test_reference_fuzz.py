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


def _tounicode_font(rng: random.Random) -> tuple[bytes, bytes, list[int]]:
    """Random Type0 font with a ToUnicode CMap: returns (font dict
    body referencing obj 7, cmap stream payload, valid CID list)."""
    cids = sorted(rng.sample(range(0x20, 0x200), rng.randint(3, 8)))
    dsts = [rng.randint(0x21, 0x7E) for _ in cids]
    n_char = rng.randint(1, len(cids))
    bfchar = b"".join(
        b"<%04X> <%04X>\n" % (c, d) for c, d in zip(cids[:n_char], dsts[:n_char])
    )
    parts = [b"%d beginbfchar\n" % n_char + bfchar + b"endbfchar\n"]
    rest = cids[n_char:]
    if rest:
        lo = rest[0]
        hi = lo + rng.randint(0, 3)
        if rng.random() < 0.5:
            parts.append(
                b"1 beginbfrange\n<%04X> <%04X> <%04X>\nendbfrange\n"
                % (lo, hi, rng.randint(0x41, 0x6A))
            )
        else:
            arr = b" ".join(
                b"<%04X>" % rng.randint(0x21, 0x7E) for _ in range(hi - lo + 1)
            )
            parts.append(
                b"1 beginbfrange\n<%04X> <%04X> [%s]\nendbfrange\n" % (lo, hi, arr)
            )
        cids = cids[:n_char] + list(range(lo, hi + 1))
    else:
        cids = cids[:n_char]
    cmap = b"begincmap\n" + b"".join(parts) + b"endcmap\n"
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /Fz /ToUnicode 7 0 R >>"
    return font, cmap, cids


def _cid_content(rng: random.Random, cids: list[int]) -> bytes:
    ops = [b"BT", b"/F1 %s Tf" % _pos_num(rng, 8, 24),
           b"%s %s Td" % (_pos_num(rng, 50, 400), _pos_num(rng, 50, 700))]
    for _ in range(rng.randint(1, 6)):
        seq = b"".join(b"%04X" % rng.choice(cids) for _ in range(rng.randint(1, 6)))
        if rng.random() < 0.2:
            seq += b"%02X" % rng.randint(0, 255)  # odd trailing byte
        ops.append(b"<%s> Tj" % seq)
        if rng.random() < 0.4:
            ops.append(b"0 %s Td" % _fmt_num(rng))
    ops.append(b"ET")
    return b" ".join(ops)


def gen_structured_pdf(rng: random.Random) -> bytes:
    """Randomized DOCUMENT STRUCTURE around random content: classic
    xref, nested page trees with wrong /Count, Contents arrays,
    indirect /Length, incremental-update Prev chains, xref streams
    with ObjStm (random /W widths and optional /Index), Type0
    ToUnicode fonts."""
    c = rng.random()
    fonts = [b"F1", b"F2"]

    if c < 0.18:
        # Type0 + ToUnicode over a classic xref
        font, cmap, cids = _tounicode_font(rng)
        b = PdfBuilder()
        b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
        b.add_stream(4, b"", _cid_content(rng, cids))
        b.add(5, font)
        b.add_stream(7, b"", cmap)
        return b.build()

    if c < 0.40:
        # classic xref + nested page tree (wrong /Count) + Contents
        # array + sometimes indirect /Length
        b = PdfBuilder()
        n_leaf = rng.randint(1, 3)
        b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        b.add(2, b"<< /Type /Pages /Kids [8 0 R] /Count %d >>" % rng.randint(0, 9))
        kids = b" ".join(b"%d 0 R" % (10 + i) for i in range(n_leaf))
        b.add(8, b"<< /Type /Pages /Parent 2 0 R /Kids [%s] /Count %d >>"
              % (kids, n_leaf))
        b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
              % rng.choice(ENCODINGS))
        b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
              % rng.choice(ENCODINGS))
        res = b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >>"
        for i in range(n_leaf):
            if rng.random() < 0.4:
                # Contents array: streams concatenated with \n
                parts = [_content_stream(rng, fonts) for _ in range(2)]
                b.add_stream(30 + 2 * i, b"", parts[0])
                b.add_stream(31 + 2 * i, b"", parts[1])
                contents = b"[%d 0 R %d 0 R]" % (30 + 2 * i, 31 + 2 * i)
            else:
                content = _content_stream(rng, fonts)
                if rng.random() < 0.3:
                    b.add(30 + 2 * i, b"<< /Length %d 0 R >>\nstream\n"
                          % (50 + i) + content + b"\nendstream")
                    b.add(50 + i, b"%d" % len(content))
                else:
                    b.add_stream(30 + 2 * i, b"", content)
                contents = b"%d 0 R" % (30 + 2 * i)
            b.add(10 + i, b"<< /Type /Page /Parent 8 0 R "
                  b"/MediaBox [0 0 612 792] /Contents %s %s >>" % (contents, res))
        return b.build()

    if c < 0.65:
        # incremental update replacing the content stream
        b = PdfBuilder()
        b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
        b.add_stream(4, b"", _content_stream(rng, [b"F1"]))
        b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
              % rng.choice(ENCODINGS))
        base = b.build()
        base_xref_off = base.rfind(b"\nxref\n") + 1
        out = bytearray(base)
        for _ in range(rng.randint(1, 2)):
            new_content = _content_stream(rng, [b"F1"])
            obj_off = len(out)
            out += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
                    + new_content + b"\nendstream\nendobj\n")
            new_xref_off = len(out)
            out += b"xref\n4 1\n%010d 00000 n \n" % obj_off
            out += (b"trailer\n<< /Size 6 /Root 1 0 R /Prev %d >>\n"
                    b"startxref\n%d\n%%%%EOF\n" % (base_xref_off, new_xref_off))
            base_xref_off = new_xref_off
        return bytes(out)

    # xref stream + ObjStm with random /W widths and optional /Index
    content = _content_stream(rng, [b"F1"])
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 8 0 R >> >> >>"),
        (8, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
            % rng.choice(ENCODINGS)),
    ]
    bodies = b""
    header_pairs = []
    for num, body in inner:
        header_pairs.append(b"%d %d" % (num, len(bodies)))
        bodies += body + b" "
    header = b" ".join(header_pairs) + b"\n"
    objstm_payload = header + bodies
    first = len(header)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}
    offsets[4] = len(out)
    if rng.random() < 0.5:
        payload, filt = zlib.compress(content), b" /Filter /FlateDecode"
    else:
        payload, filt = content, b""
    out += (b"4 0 obj\n<< /Length %d%s >>\nstream\n" % (len(payload), filt)
            + payload + b"\nendstream\nendobj\n")
    compressed = zlib.compress(objstm_payload)
    offsets[5] = len(out)
    out += (b"5 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n"
            % (len(inner), first, len(compressed))
            + compressed + b"\nendstream\nendobj\n")
    xref_off = len(out)
    w2 = rng.choice([2, 3, 4])  # offset field width
    rows = [
        (0, 0, 0),
        (2, 5, 0), (2, 5, 1), (2, 5, 2),   # 1..3 in ObjStm idx 0..2
        (1, offsets[4], 0),
        (1, offsets[5], 0),
        (1, xref_off, 0),                   # 6: the xref stream itself
        (0, 0, 0),                          # 7: free
        (2, 5, 3),                          # 8: font in ObjStm idx 3
    ]
    data = bytearray()
    for t, f2, f3 in rows:
        data += bytes([t]) + f2.to_bytes(w2, "big") + f3.to_bytes(1, "big")
    xdata = zlib.compress(bytes(data))
    index = b" /Index [0 9]" if rng.random() < 0.5 else b""
    out += (b"6 0 obj\n<< /Type /XRef /Size 9 /W [1 %d 1]%s /Root 1 0 R "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (w2, index, len(xdata)) + xdata + b"\nendstream\nendobj\n")
    out += b"startxref\n%d\n%%%%EOF\n" % xref_off
    return bytes(out)


def _run_diff(ref_bin, data: bytes, label: str) -> list:
    diffs = []
    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        for fmt, flag in FLAG.items():
            r = subprocess.run([ref_bin, path, flag], capture_output=True,
                               timeout=60)
            try:
                ours = FN[fmt](data) + "\n"
            except PdfError:
                ours = None
            if r.returncode != 0:
                if ours is not None:
                    diffs.append((label, fmt, "ref-failed", r.stderr[:120]))
                continue
            ref = r.stdout.decode("utf-8", "replace")
            if ours is None:
                ours = "\n"
            if ref != ours:
                diffs.append((label, fmt, repr(ref[:80]), repr(ours[:80])))
    finally:
        os.unlink(path)
    return diffs


def test_fuzz_structure_byte_identity(ref_bin):
    rng = random.Random(SEED + 1)
    for doc_i in range(150):
        data = gen_structured_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"struct-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 1} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


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


# -- line-run fast-path fuzz -------------------------------------------------
#
# The content interpreter batches runs of the fused
# `/Name size Tf a b c d e f Tm (text) Tj` sequence and skips the
# span-merge pass when lines are y-separated beyond tolerance
# (engine/content.py).  This class generates exactly that shape with
# adversarial perturbations — comments/extra ops breaking runs,
# same-line and exact-boundary y values, escape-bearing and
# control-byte strings (forcing the non-identity default decode),
# huge-digit coordinates (inf), stale operands before Tm — and
# asserts byte-identity vs the reference CLI in all six formats.


def _line_run_content(rng: random.Random, fonts: list[bytes]) -> bytes:
    # Span budget: at most 20 text-showing ops per page.  rustc 1.95's
    # stable sort runs plain insertion sort for slices of len <= 20
    # (never detecting comparator inconsistency) and our engine
    # replicates that exactly (engine/content.py), so <= 20 spans is
    # the regime where byte-identity is *provable* even for the
    # tolerance-chained y layouts this class generates.  At >= 21
    # spans the reference itself PANICS on such layouts
    # (test_reference_panics_on_tolerance_chain below pins that).
    spans_left = 20
    ops: list[bytes] = [b"BT"]
    y = 760.0
    fs = rng.choice([10, 12, 14])
    for _ in range(rng.randint(3, 25)):
        if spans_left <= 0:
            break
        c = rng.random()
        # text payload: mostly clean (identity decode), sometimes
        # escapes / control bytes / high bytes / whitespace-only
        t = rng.random()
        if t < 0.6:
            s = b"(line %d words)" % rng.randint(0, 999)
        elif t < 0.75:
            s = _literal_string(rng)
        elif t < 0.85:
            s = b"(ctl \x01\x02 high \xc3\xa9)"
        else:
            s = b"(   )"
        if c < 0.55:
            # canonical fused line; y step varies: clean separation,
            # exact 0.3*fs boundary, same line, tiny step, or upward
            step = rng.choice([16.0, fs * 0.3, 0.0, 0.1, -12.0])
            y -= step
            spans_left -= 1
            ops.append(b"/%s %d Tf 1 0 0 1 %s %s Tm %s Tj"
                       % (rng.choice(fonts), fs,
                          _fmt_num(rng) if rng.random() < 0.1 else b"%.1f" % (40 + rng.random() * 400),
                          b"%.1f" % y, s))
        elif c < 0.65:
            # run breaker: comment between items
            ops.append(b"% break\n")
        elif c < 0.72:
            # huge-digit coordinate -> f64 inf on both sides
            spans_left -= 1
            ops.append(b"/%s %d Tf 1 0 0 1 %d %s Tm %s Tj"
                       % (rng.choice(fonts), fs, rng.randint(10, 500),
                          b"9" * rng.randint(200, 400), s))
        elif c < 0.80:
            # stale operands before the fused sequence
            spans_left -= 1
            ops.append(b"%d %d" % (rng.randint(0, 9), rng.randint(0, 9)))
            ops.append(b"/%s %d Tf 1 0 0 1 50 %s Tm %s Tj"
                       % (rng.choice(fonts), fs, b"%.1f" % y, s))
        elif c < 0.88:
            # partial triplet: Tf+Tm without Tj, or bare Tj after
            ops.append(b"/%s %d Tf %s Tm"
                       % (rng.choice(fonts), fs,
                          b" ".join(_fmt_num(rng) for _ in range(6))))
            if rng.random() < 0.5:
                spans_left -= 1
                ops.append(s + b" Tj")
        else:
            # interleaved non-LINE text op keeps state honest
            op = rng.choice([
                b"T*", b"%d TL" % rng.randint(2, 30),
                s + b" '", b"8 2 %s \"" % s,
                b"0 -14 Td",
            ])
            if op.endswith((b"'", b'\"')):
                spans_left -= 1
            ops.append(op)
    ops.append(b"ET")
    return b" ".join(ops)


def gen_line_run_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
          % rng.choice(ENCODINGS))
    res = b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >>"
    content = _line_run_content(rng, [b"F1", b"F2"])
    if rng.random() < 0.4:
        payload, filters = zlib.compress(content), b"/FlateDecode"
    else:
        payload, filters = content, None
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R %s >>" % res)
    b.add_stream(30, b"", payload, filters)
    return b.build()


def test_fuzz_line_runs_byte_identity(ref_bin):
    rng = random.Random(SEED + 2)
    for doc_i in range(120):
        data = gen_line_run_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"linerun-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 2} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def _uniform_run_content(rng: random.Random) -> bytes:
    """Long runs where font/size/matrix-a-d stay BYTE-constant and only
    e/f/text vary — the shape the specialized per-run matcher
    (engine/content.py _specialized_line_re) consumes — salted with
    items crafted to break out of it:

    * e/f spellings the number CLASS accepts but float() rejects
      ("1-2", "++5", "1.2.3", ".", "-") — the ValueError fallback must
      re-lex from the exact failing position;
    * strings with escapes / nested parens — the specialized pattern
      excludes backslash, so the generic item loop must take over
      mid-run without losing the line matrix;
    * value-equal but byte-different matrix fields ("12" vs "12.0",
      "1" vs "1.00") — ends one specialization key, starts another.
    """
    fs = rng.choice([b"10", b"12", b"12.0", b"14"])
    font = rng.choice([b"F1", b"F2"])
    a, b_, c_, d = b"1", b"0", b"0", b"1"
    ops: list[bytes] = [b"BT"]
    spans_left = 20
    y = 760.0
    n_items = rng.randint(10, 40)
    for _ in range(n_items):
        if spans_left <= 0:
            break
        y -= rng.choice([14.0, 16.0, 0.0])
        x = b"%.1f" % (40 + rng.random() * 300)
        roll = rng.random()
        if roll < 0.70:
            s = b"(uniform run words %d)" % rng.randint(0, 999)
            spans_left -= 1
            ops.append(b"/%s %s Tf %s %s %s %s %s %s Tm %s Tj"
                       % (font, fs, a, b_, c_, d, x, b"%.1f" % y, s))
        elif roll < 0.80:
            # float()-rejectable coordinate in e or f
            bad = rng.choice([b"1-2", b"++5", b"1.2.3", b".", b"-", b"5-"])
            e_f = (bad, b"%.1f" % y) if rng.random() < 0.5 else (x, bad)
            ops.append(b"/%s %s Tf %s %s %s %s %s %s Tm (bad coord) Tj"
                       % (font, fs, a, b_, c_, d, *e_f))
            spans_left -= 1  # reference may still emit a span
        elif roll < 0.90:
            # escape-bearing string: spec pattern must hand over to the
            # generic loop exactly at this item
            s = rng.choice([
                b"(esc \\(paren\\) tail)",
                b"(nested (deep) parens)",
                b"(back\\\\slash \\101)",
            ])
            spans_left -= 1
            ops.append(b"/%s %s Tf %s %s %s %s %s %s Tm %s Tj"
                       % (font, fs, a, b_, c_, d, x, b"%.1f" % y, s))
        else:
            # byte-variant field value: same number, new spec key
            fs = rng.choice([b"10", b"12", b"12.0", b"12.00", b"14"])
            if rng.random() < 0.3:
                a = rng.choice([b"1", b"1.0", b"1.00"])
            if rng.random() < 0.3:
                font = rng.choice([b"F1", b"F2"])
            s = b"(key switch %d)" % rng.randint(0, 99)
            spans_left -= 1
            ops.append(b"/%s %s Tf %s %s %s %s %s %s Tm %s Tj"
                       % (font, fs, a, b_, c_, d, x, b"%.1f" % y, s))
    ops.append(b"ET")
    return b" ".join(ops)


def gen_uniform_run_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
          % rng.choice(ENCODINGS))
    res = b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >>"
    content = _uniform_run_content(rng)
    if rng.random() < 0.4:
        payload, filters = zlib.compress(content), b"/FlateDecode"
    else:
        payload, filters = content, None
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R %s >>" % res)
    b.add_stream(30, b"", payload, filters)
    return b.build()


def test_fuzz_uniform_runs_byte_identity(ref_bin):
    """Differential fuzz for the specialized uniform-run fast path:
    frozen-field runs with hostile break-out items must stay
    byte-identical to the reference in every format."""
    rng = random.Random(SEED + 7)
    for doc_i in range(120):
        data = gen_uniform_run_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"uniformrun-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 7} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_reference_panics_on_tolerance_chain(ref_bin):
    """Pin the two halves of the >20-span contract.

    The reference's pre-merge span sort (content/parser.rs:144-152)
    compares y with a +/-0.3*font_size tolerance, which is not
    transitive when y values chain across the boundary.  rustc 1.95's
    stable sort runs plain insertion sort up to len 20 (no violation
    detection possible), but from len 21 its driftsort quick/smallsort
    paths detect the inconsistency and PANIC, killing the CLI
    (smallsort.rs:860).  We deliberately do not reproduce that crash:
    a 10^12-document job must not abort on one pathological layout.
    This test pins (a) the reference really does die on such a page,
    and (b) our engine extracts it deterministically.
    """
    # 34 spans whose y values chain across the 3.6-pt tolerance at
    # fs=12 (comparator cycles).  Driftsort's violation detection is
    # opportunistic — monotone staircases survive — so this exact
    # layout was found by driving rustc 1.95's slice sort directly
    # over candidate span sets and keeping one that panics.
    coords = [
        (50.0, 759.9), (100.0, 759.9), (100.0, 759.8), (100.0, 756.08),
        (100.0, 755.98), (200.0, 752.26), (425.7, 750.46), (50.0, 746.86),
        (200.0, 746.76), (100.0, 746.76), (-873.0, 743.04), (425.7, 735.84),
        (-873.0, 735.84), (-873.0, 732.12), (425.7, 740.12), (100.0, 732.92),
        (100.0, 725.72), (200.0, 725.72), (100.0, 733.72), (425.7, 730.12),
        (-873.0, 714.12), (425.7, 712.32), (425.7, 705.12), (425.7, 703.32),
        (200.0, 711.32), (50.0, 711.32), (100.0, 704.12), (-873.0, 702.32),
        (50.0, 702.32), (200.0, 710.32), (200.0, 718.32), (100.0, 711.12),
        (200.0, 719.12), (425.7, 719.02),
    ]
    fs = 12
    ops = [b"BT"]
    for i, (x, y) in enumerate(coords):
        ops.append(b"/F1 %d Tf 1 0 0 1 %s %s Tm (s%d) Tj"
                   % (fs, repr(x).encode(), repr(y).encode(), i))
    ops.append(b"ET")
    content = b" ".join(ops)

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    b.add_stream(30, b"", content, None)
    data = b.build()

    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        r = subprocess.run([ref_bin, path, "--txt"], capture_output=True,
                           timeout=60)
    finally:
        os.unlink(path)
    assert r.returncode != 0
    assert b"does not correctly implement a total order" in r.stderr

    one = {fmt: fn(data) for fmt, fn in FN.items()}
    two = {fmt: fn(data) for fmt, fn in FN.items()}
    assert one == two
    assert "s0" in one["txt"]


# -- fast-path fallback fuzzing -----------------------------------------
# The combined-regex fast paths (dict entries, all-ref arrays, obj
# headers — parser.py/document.py) must fall back to the token path on
# every off-pattern shape with UNCHANGED semantics.  Generate documents
# whose structural syntax is deliberately off-pattern (comments inside
# Kids arrays and headers, odd spacing, single-element ref arrays,
# number-with-comment entries) and diff all six formats against the
# reference binary.


def _odd_ws(rng: random.Random) -> bytes:
    """Whitespace/comment filler legal between any two tokens."""
    picks = [b" ", b"  ", b"\n", b"\r\n", b"\t", b" % note\n", b"\x00 ",
             b" %\n", b"\x0c"]
    return b"".join(rng.choice(picks) for _ in range(rng.randint(1, 2)))


def gen_fastpath_fallback_pdf(rng: random.Random) -> bytes:
    w = lambda: _odd_ws(rng)  # noqa: E731
    n_pages = rng.randint(1, 3)
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = w().join(b"%d 0 R" % (10 + i) for i in range(n_pages))
    b.add(2, b"<<%s/Type /Pages /Kids [%s%s%s] /Count%s%d >>"
          % (w(), w(), kids, w(), w(), rng.randint(0, 9)))
    # #-escaped names knock the dict-entry fast path's atomic name
    # groups back to the token path (e.g. /Helvetica#2DBold = the
    # BaseFont 'Helvetica-Bold'); the binary must agree byte-for-byte
    base = rng.choice([b"/Helvetica", b"/Helvetica#2DBold", b"/Times#20New"])
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont %s%s >>"
          % (base, rng.choice(ENCODINGS)))
    res = b"/Resources << /Font << /F1 5 0 R >> >>"
    for i in range(n_pages):
        content = _content_stream(rng, [b"F1"])
        if rng.random() < 0.5:
            # single-element ref ARRAY Contents (fast-path vrefs shape)
            b.add_stream(30 + i, b"", content)
            contents = b"[%s%d 0 R%s]" % (w(), 30 + i, w())
        else:
            b.add_stream(30 + i, b"", content)
            contents = b"%d 0 R" % (30 + i)
        mb = b"[%s0 0%s612 792%s]" % (w(), w(), w())
        b.add(10 + i, b"<<%s/Type /Page /Parent 2 0 R /MediaBox %s "
              b"/Contents %s %s%s>>" % (w(), mb, contents, res, w()))
    data = b.build()
    if rng.random() < 0.5:
        # incremental update whose OBJ HEADER carries odd ws/comments —
        # knocks the _OBJ_HDR_RE fast path back to the token path
        new_content = _content_stream(rng, [b"F1"])
        base_xref_off = data.rfind(b"\nxref\n") + 1
        out = bytearray(data)
        obj_off = len(out)
        out += (b"30" + w() + b"0" + w() + b"obj\n<< /Length %d >>\nstream\n"
                % len(new_content) + new_content + b"\nendstream\nendobj\n")
        new_xref_off = len(out)
        out += b"xref\n30 1\n%010d 00000 n \n" % obj_off
        out += (b"trailer\n<< /Size 40 /Root 1 0 R /Prev %d >>\n"
                b"startxref\n%d\n%%%%EOF\n" % (base_xref_off, new_xref_off))
        return bytes(out)
    return data


def test_fuzz_fastpath_fallback_byte_identity(ref_bin):
    rng = random.Random(SEED + 7)
    all_diffs = []
    for doc_i in range(80):
        data = gen_fastpath_fallback_pdf(rng)
        all_diffs += _run_diff(ref_bin, data, f"fallback-{doc_i}")
    assert not all_diffs, all_diffs[:4]


# -- incremental xref-stream chains with conflicting ObjStm entries ----------
#
# VERDICT r2 #8 frontier: revision chains where the SAME object number
# lives in DIFFERENT /ObjStm containers across revisions (newest xref
# entry must win while the older ObjStm still serves its unchanged
# objects), and xref streams whose /Index carries gapped multi-pair
# subsections, zero-count pairs, odd-length arrays, unknown row types,
# re-listed shadow entries, and truncated row data (both sides break
# out of the row loop identically — document.rs:388/engine
# document.py:613).


def _objstm(num: int, inner: list[tuple[int, bytes]]) -> tuple[bytes, dict]:
    """Build an /ObjStm object; returns (bytes, {objnum: index})."""
    bodies = b""
    header_pairs = []
    for n, body in inner:
        header_pairs.append(b"%d %d" % (n, len(bodies)))
        bodies += body + b" "
    header = b" ".join(header_pairs) + b"\n"
    payload = zlib.compress(header + bodies)
    blob = (b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
            b"/Filter /FlateDecode >>\nstream\n"
            % (num, len(inner), len(header), len(payload))
            + payload + b"\nendstream\nendobj\n")
    return blob, {n: i for i, (n, _) in enumerate(inner)}


def _xref_stream(rng: random.Random, num: int, pairs, size: int,
                 prev: int | None, trunc_last: bool) -> bytes:
    """Build an /XRef stream object from ``pairs`` =
    [(start, [(type, f2, f3), ...]), ...]; always emits /Index."""
    w2 = rng.choice([2, 3, 4])
    data = bytearray()
    for _, rows in pairs:
        for t, f2, f3 in rows:
            data += bytes([t]) + f2.to_bytes(w2, "big") + f3.to_bytes(1, "big")
    if trunc_last:
        data = data[: -(2 + w2)]  # torn final row: both sides break out
    index = b" ".join(b"%d %d" % (s, len(rows)) for s, rows in pairs)
    if rng.random() < 0.25:
        index += b" %d" % rng.randint(50, 90)  # odd-length /Index: count 0
    payload = zlib.compress(bytes(data))
    prev_part = b" /Prev %d" % prev if prev is not None else b""
    return (b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 %d 1] /Index [%s] "
            b"/Root 1 0 R%s /Filter /FlateDecode /Length %d >>\nstream\n"
            % (num, size, w2, index, prev_part, len(payload))
            + payload + b"\nendstream\nendobj\n")


def _noise_pairs(rng: random.Random, size: int) -> list:
    """Row-space noise: free rows, unknown types, zero-count pairs."""
    out = []
    if rng.random() < 0.35:
        out.append((size + rng.randint(0, 3), [(0, 0, 0)]))     # free
    if rng.random() < 0.30:
        out.append((size + 10, [(7, rng.randint(0, 9999), 0)]))  # unknown
    if rng.random() < 0.30:
        out.append((rng.randint(40, 60), []))                    # zero-count
    rng.shuffle(out)
    return out


def gen_xref_chain_pdf(rng: random.Random) -> bytes:
    fonts = [b"F1"]
    out = bytearray(b"%PDF-1.5\n")

    # revision 0: catalog/pages/page/font in ObjStm 5, content 4,
    # xref stream 6
    content0 = _content_stream(rng, fonts)
    off4 = len(out)
    if rng.random() < 0.5:
        payload, filt = zlib.compress(content0), b" /Filter /FlateDecode"
    else:
        payload, filt = content0, b""
    out += (b"4 0 obj\n<< /Length %d%s >>\nstream\n" % (len(payload), filt)
            + payload + b"\nendstream\nendobj\n")
    inner0 = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 8 0 R >> >> >>"),
        (8, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
            % rng.choice(ENCODINGS)),
    ]
    off5 = len(out)
    blob, idx0 = _objstm(5, inner0)
    out += blob
    xref_off = len(out)
    base_rows = [
        (0, 0, 0),                      # 0 free
        (2, 5, idx0[1]), (2, 5, idx0[2]), (2, 5, idx0[3]),
        (1, off4, 0), (1, off5, 0), (1, xref_off, 0),
        (0, 0, 0),                      # 7 free
        (2, 5, idx0[8]),
    ]
    if rng.random() < 0.5:
        pairs = [(0, base_rows)]
    else:
        # gapped spelling of the same mapping: split at a random point
        k = rng.randint(2, 7)
        pairs = [(0, base_rows[:k]), (k, base_rows[k:])]
    out += _xref_stream(rng, 6, pairs, 9, None, trunc_last=False)
    prev_off = xref_off

    cur_content = 4
    size = 9
    for upd in range(rng.randint(1, 2)):
        nb = 10 * (upd + 1)
        new_content = _content_stream(rng, fonts)
        if rng.random() < 0.45:
            # (a) replace the live content object in place
            offc = len(out)
            out += (b"%d 0 obj\n<< /Length %d >>\nstream\n"
                    % (cur_content, len(new_content))
                    + new_content + b"\nendstream\nendobj\n")
            xoff = len(out)
            size = max(size, nb + 7)
            pairs = [(cur_content, [(1, offc, 0)]),
                     (nb + 6, [(1, xoff, 0)])]
        else:
            # (b) conflicting ObjStm: objects 3 and 8 move to a NEW
            # container while ObjStm 5 still serves 1 and 2; page now
            # points at content nb+4; font may change encoding (the
            # output text proves which revision won)
            offc = len(out)
            out += (b"%d 0 obj\n<< /Length %d >>\nstream\n"
                    % (nb + 4, len(new_content))
                    + new_content + b"\nendstream\nendobj\n")
            inner1 = [
                (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    b"/Contents %d 0 R /Resources << /Font << /F1 8 0 R >> "
                    b">> >>" % (nb + 4)),
                (8, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
                    % rng.choice(ENCODINGS)),
            ]
            if rng.random() < 0.4:
                # stale duplicate of the catalog: present in the new
                # container but never pointed at by any xref entry
                inner1.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
            rng.shuffle(inner1)
            offs = len(out)
            blob, idx1 = _objstm(nb + 5, inner1)
            out += blob
            xoff = len(out)
            size = max(size, nb + 7)
            pairs = [(3, [(2, nb + 5, idx1[3])]),
                     (8, [(2, nb + 5, idx1[8])]),
                     (nb + 4, [(1, offc, 0), (1, offs, 0), (1, xoff, 0)])]
            cur_content = nb + 4
        if rng.random() < 0.3:
            # shadow re-list of an unchanged object at its live location
            pairs.append((5, [(1, off5, 0)]))
        noise = _noise_pairs(rng, size)
        trunc = bool(noise) and rng.random() < 0.5 and noise[-1][1]
        pairs += noise
        out += _xref_stream(rng, nb + 6, pairs, size, prev_off,
                            trunc_last=bool(trunc))
        prev_off = xoff

    out += b"startxref\n%d\n%%%%EOF\n" % prev_off
    return bytes(out)


def test_fuzz_xref_chain_byte_identity(ref_bin):
    rng = random.Random(SEED + 11)
    for doc_i in range(120):
        data = gen_xref_chain_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"xchain-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 11} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


# -- inline-image / foreign-operator junk fuzz -------------------------------
#
# The reference content parser has NO special BI/ID/EI arm
# (content/parser.rs:490-523 dispatch): an inline image's binary
# payload is tokenized by the same operand/operator loop as real
# content — unknown bytes advance one at a time (parser.rs:299-303),
# alphabetic runs become ignored operators, digit runs become dropped
# operands, NUL counts as whitespace (parser.rs:227), '<' starts a
# hex-string scan that skips non-hex bytes until '>', and an
# unbalanced '(' swallows everything to end-of-stream through
# read_string.  Our regex-batched interpreter must walk the junk
# byte-for-byte the same way, including when islands land INSIDE a BT
# block and perturb the text state.  This class plants BI .. ID
# <junk> EI islands between and inside real text blocks.

def _junk_island(rng: random.Random) -> bytes:
    parts = [b"BI"]
    for _ in range(rng.randint(0, 3)):  # plausible image dict entries
        parts.append(rng.choice([b"/W 4", b"/H 4", b"/BPC 8", b"/CS /G",
                                 b"/F /AHx", b"/IM true"]))
    parts.append(b"ID")
    body = bytearray()
    for _ in range(rng.randint(2, 24)):
        c = rng.random()
        if c < 0.30:
            body += bytes(rng.randint(0x80, 0xFE)
                          for _ in range(rng.randint(1, 6)))
        elif c < 0.42:
            body += b"%d" % rng.randint(0, 99999)
        elif c < 0.52:
            body += bytes(rng.choice(b"abcdefgqQTERSXY")
                          for _ in range(rng.randint(1, 4)))
        elif c < 0.60:
            # NOTE: no top-level ']' or '>' — parse_operand returns
            # None WITHOUT consuming them (parser.rs:295), so the
            # reference's main loop (parser.rs:97-129) spins forever
            # on a stray one.  test_reference_hangs_on_stray_bracket
            # pins that divergence; here we stay in the terminating
            # envelope so byte identity is checkable.
            body += rng.choice([b"\x00", b"\x0c", b"\\", b")",
                                b"}", b"{", b"*", b"#"])
        elif c < 0.68:
            body += b"(paren %d)" % rng.randint(0, 9)
        elif c < 0.74:
            body += b"<A0F%d>" % rng.randint(0, 9)
        elif c < 0.80:
            body += b"/Nm%d" % rng.randint(0, 9)
        elif c < 0.86:
            body += b"[1 2]" if rng.random() < 0.7 else b"["
        elif c < 0.92:
            body += b"<< /K %d >>" % rng.randint(0, 9)
        elif c < 0.97:
            body += b"% junk comment\n"
        else:
            body += b"("  # unbalanced: swallows to end-of-stream
        body += rng.choice([b"", b" ", b"\n"])
    parts.append(bytes(body))
    parts.append(b"EI")
    return b" ".join(parts)


def gen_inline_image_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
          % rng.choice(ENCODINGS))
    res = b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >>"

    text = _content_stream(rng, [b"F1", b"F2"])
    chunks = text.split(b" ET")
    out = []
    for ch in chunks:
        if ch.strip():
            out.append(ch + b" ET")
        # islands between blocks, and sometimes inside the next BT
        if rng.random() < 0.8:
            out.append(_junk_island(rng))
    if rng.random() < 0.5:
        # island INSIDE a BT block, between two shows
        out.append(b"BT /F1 12 Tf 50 700 Td (pre) Tj "
                   + _junk_island(rng) + b" (post) Tj ET")
    content = b" ".join(out)
    if rng.random() < 0.35:
        payload, filters = zlib.compress(content), b"/FlateDecode"
    else:
        payload, filters = content, None
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R %s >>" % res)
    b.add_stream(30, b"", payload, filters)
    return b.build()


def test_fuzz_inline_image_junk_byte_identity(ref_bin):
    rng = random.Random(SEED + 13)
    for doc_i in range(120):
        data = gen_inline_image_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"bi-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 13} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_reference_hangs_on_stray_bracket_we_terminate():
    """Divergence pinned on purpose (like the tolerance-chain panic):
    a top-level stray ']' or '>' makes the reference's main loop spin
    forever — parse_operand returns None without consuming the byte
    (content/parser.rs:295) and parse() re-enters at the same pos
    (parser.rs:97-129).  A web-scale engine cannot inherit an
    infinite loop from hostile bytes, so OUR interpreter skips the
    stray delimiter and must finish instantly with the surrounding
    text intact.  (Not run against the binary: it would hang the
    suite; the code-level cause is cited instead.)"""
    import time

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    b.add_stream(
        30, b"", b"BT /F1 12 Tf 50 700 Td (pre) Tj ] > (post) Tj ET", None
    )
    data = b.build()
    t0 = time.time()
    out = api.pdf_to_text(data)
    assert time.time() - t0 < 5.0
    assert "pre" in out and "post" in out


# -- split-/Contents boundary fuzz -------------------------------------------
#
# A page's /Contents may be an ARRAY of streams; the reference
# concatenates them with '\n' after each part (document.rs:728-739)
# and only then parses — so a token that straddles a stream boundary
# gains an interior newline: a split literal string absorbs a real
# '\n' character, a split number or operator becomes two tokens.
# This class splits a valid content stream at RANDOM byte positions
# (mid-string, mid-number, mid-operator) into 2-4 member streams,
# individually and randomly Flate-compressed, and asserts byte
# identity — pinning that our get_page_contents join byte and the
# downstream tokenization drift nowhere.

def gen_split_contents_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    b.add(6, b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier%s >>"
          % rng.choice(ENCODINGS))
    content = _content_stream(rng, [b"F1", b"F2"])
    n_parts = rng.randint(2, 4)
    # A cut BETWEEN the two chars of '<<' or '>>' leaves a lone
    # top-level '<'/'>' after the join: the lone '<' eats hex-ish
    # bytes to the first '>' and the survivor '>' then spins the
    # reference's main loop forever (same parse_operand defect as
    # test_reference_hangs_on_stray_bracket_we_terminate, where OUR
    # termination on that shape is pinned).  Every other position —
    # mid-string, mid-number, mid-operator, mid-escape — is fair
    # game for the identity check.
    legal = [
        c for c in range(1, len(content))
        if not (content[c - 1] == content[c]
                and content[c] in (ord("<"), ord(">")))
    ]
    cuts = sorted(rng.sample(legal, min(n_parts - 1, len(legal))))
    parts, prev = [], 0
    for c in cuts + [len(content)]:
        parts.append(content[prev:c])
        prev = c
    refs = []
    for i, part in enumerate(parts):
        if rng.random() < 0.4:
            payload, filters = zlib.compress(part), b"/FlateDecode"
        else:
            payload, filters = part, None
        b.add_stream(30 + i, b"", payload, filters)
        refs.append(b"%d 0 R" % (30 + i))
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents [%s] /Resources << /Font << /F1 5 0 R /F2 6 0 R"
          b" >> >> >>" % b" ".join(refs))
    return b.build()


def test_fuzz_split_contents_byte_identity(ref_bin):
    rng = random.Random(SEED + 17)
    for doc_i in range(120):
        data = gen_split_contents_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"split-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 17} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_we_terminate_on_pair_breaking_contents_split():
    """The other spelling of the stray-bracket hang: a /Contents array
    whose boundary lands BETWEEN the two chars of '<<' (real-world
    linearized PDFs split content at arbitrary byte offsets).  After
    the '\\n' join the lone '<' scans hex-ish bytes to the first '>'
    and the surviving '>' spins the reference's main loop forever
    (content/parser.rs:295 + 97-129).  Our engine must finish fast
    with the text around the wreckage intact."""
    import time

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    part_a = b"BT /F1 12 Tf 50 700 Td (pre) Tj /P <"
    part_b = b"< /MCID 3 >> BDC (post) Tj ET"
    b.add_stream(30, b"", part_a, None)
    b.add_stream(31, b"", part_b, None)
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents [30 0 R 31 0 R] /Resources << /Font "
          b"<< /F1 5 0 R >> >> >>")
    data = b.build()
    t0 = time.time()
    out = api.pdf_to_text(data)
    assert time.time() - t0 < 5.0
    assert "pre" in out


# -- page-tree pathology fuzz -------------------------------------------------
#
# The page walk (document.rs:678-717) recurses over /Kids with no
# visited set and no depth bound.  Three regimes matter at web scale:
# ordinary shapes must stay byte-identical, deep-but-legal chains must
# match as far as both engines reach, and CYCLES must not take the
# executor down.


def _page_leaf(b, num: int, parent: int, text: bytes,
               with_type: bool = True, extra: bytes = b"") -> None:
    type_part = b"/Type /Page " if with_type else b""
    # the stream lives at num+1: every caller allocates page numbers
    # on a stride >= 2, so +1 can never collide with another node
    b.add(num, b"<< %s/Parent %d 0 R /MediaBox [0 0 612 792] "
          b"/Contents %d 0 R "
          b"/Resources << /Font << /F1 5 0 R >> >> %s>>"
          % (type_part, parent, num + 1, extra))
    b.add_stream(num + 1, b"",
                 b"BT /F1 12 Tf 50 700 Td (" + text + b") Tj ET", None)


def gen_page_tree_pdf(rng: random.Random) -> bytes:
    """Random legal page tree: nested /Pages fan-out (depth ≤ 4),
    leaves that are typed /Page, typeless-with-Contents (counted as a
    page, document.rs:707-711), and typeless-without-Contents
    (skipped) interleaved in random order."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    next_num = [10]

    def build_node(num: int, parent: int, depth: int) -> None:
        n_kids = rng.randint(1, 3)
        kids = []
        for _ in range(n_kids):
            kid = next_num[0]
            next_num[0] += 10
            kids.append(kid)
            roll = rng.random()
            if depth < 4 and roll < 0.35:
                build_node(kid, num, depth + 1)
            elif roll < 0.75:
                _page_leaf(b, kid, num, b"leaf %d" % kid)
            elif roll < 0.9:
                # typeless node WITH Contents: counts as a page
                _page_leaf(b, kid, num, b"untyped %d" % kid,
                           with_type=False)
            else:
                # typeless node with neither Contents nor MediaBox:
                # silently skipped by both engines
                b.add(kid, b"<< /Parent %d 0 R >>" % num)
        b.add(num, b"<< /Type /Pages /Kids [%s] /Count %d >>"
              % (b" ".join(b"%d 0 R" % k for k in kids), len(kids)))

    build_node(2, 1, 0)
    return b.build()


def test_fuzz_page_tree_byte_identity(ref_bin):
    rng = random.Random(SEED + 11)
    for doc_i in range(120):
        data = gen_page_tree_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"pagetree-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 11} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_deep_page_chain_byte_identity(ref_bin):
    """A 200-deep single-spine /Pages chain with one leaf at the
    bottom — legal, just unusually nested (mass-produced PDF
    generators emit these).  Both engines must walk it and agree."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 10 0 R >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    depth = 200
    for i in range(depth):
        num = 10 + i
        kid = num + 1 if i < depth - 1 else 10 + depth
        b.add(num, b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % kid)
    _page_leaf(b, 10 + depth, 10 + depth - 1, b"bottom of the spine")
    data = b.build()
    diffs = _run_diff(ref_bin, data, "deep-chain")
    assert not diffs, diffs[:5]


def test_cyclic_page_tree_terminates_with_reachable_pages():
    """Divergence pinned on purpose (same policy as the stray-bracket
    hang and the tolerance-chain panic): a /Pages node whose /Kids
    contains itself (or an ancestor) makes the reference recurse until
    the thread stack overflows — verified by hand this round: the CLI
    aborts with 'has overflowed its stack' / exit 134
    (document.rs:678-717 has no visited set).  A web-scale engine
    cannot inherit a hard abort from hostile bytes: OUR walk is an
    explicit-stack DFS with an ancestor-path guard (document.py
    _collect_pages), so the cycle edge is skipped and extraction
    finishes with the reachable pages.  Not run against the binary —
    it would abort the suite; the crash signature is cited instead."""
    for cycle_kind in ("self", "ancestor"):
        b = PdfBuilder()
        b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
        if cycle_kind == "self":
            b.add(2, b"<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 >>")
            _page_leaf(b, 3, 2, b"before the loop")
        else:
            b.add(2, b"<< /Type /Pages /Kids [6 0 R] /Count 1 >>")
            b.add(6, b"<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 >>")
            _page_leaf(b, 3, 6, b"before the loop")
        data = b.build()
        r = api.extract_document(data)
        assert r["error_kind"] is None, (cycle_kind, r["error_kind"])
        assert "before the loop" in r["text"], cycle_kind
        assert "before the loop" in api.pdf_to_text(data)


def test_dag_shared_leaf_duplicates_like_reference(ref_bin):
    """A leaf referenced under TWO /Pages parents is NOT a cycle — the
    reference visits it twice and emits the page twice; the path guard
    must not dedup it."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(2, b"<< /Type /Pages /Kids [6 0 R 7 0 R] /Count 2 >>")
    b.add(6, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(7, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    _page_leaf(b, 3, 6, b"shared leaf")
    data = b.build()
    assert api.pdf_to_text(data).count("shared leaf") == 2
    diffs = _run_diff(ref_bin, data, "dag-shared-leaf")
    assert not diffs, diffs[:5]


# -- filter-chain fuzz --------------------------------------------------------
#
# /Filter may be a NAME or an ARRAY applied in list order
# (decode/mod.rs:29-44, engine/filters.py get_filters/decode_stream).
# Fuzz random hex/flate chains (depth 0-3), hex spelling variants
# (case, whitespace, '>' terminator), array-of-one vs bare name, and
# unsupported members at random chain positions (both engines must
# fail the document identically).


def _hex_encode(rng: random.Random, data: bytes) -> bytes:
    h = data.hex()
    if rng.random() < 0.5:
        h = h.upper()
    if rng.random() < 0.5:
        k = rng.randint(4, 40)
        h = "\n".join(h[i:i + k] for i in range(0, len(h), k))
    if rng.random() < 0.7:
        h += ">"
    return h.encode()


def gen_filter_chain_pdf(rng: random.Random) -> bytes:
    content = b"BT /F1 12 Tf 50 700 Td (chain %d) Tj 0 -20 Td (line two) Tj ET" % rng.randint(0, 999)
    depth = rng.randint(0, 3)
    chain = [rng.choice(["ASCIIHexDecode", "FlateDecode"]) for _ in range(depth)]
    if rng.random() < 0.2:
        chain.insert(rng.randint(0, len(chain)), "LZWDecode")
    payload = content
    for name in reversed(chain):  # decode applies list order; encode reversed
        if name == "FlateDecode":
            payload = zlib.compress(payload)
        elif name == "ASCIIHexDecode":
            payload = _hex_encode(rng, payload)
        # LZWDecode: leave payload as-is — decode errors before use
    if not chain:
        filt = None
    elif len(chain) == 1 and rng.random() < 0.5:
        filt = b"/" + chain[0].encode()
    else:
        filt = b"[ " + b" ".join(b"/" + c.encode() for c in chain) + b" ]"

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add_stream(4, b"", payload, filt)
    return b.build()


def test_fuzz_filter_chain_byte_identity(ref_bin):
    rng = random.Random(SEED + 13)
    for doc_i in range(150):
        data = gen_filter_chain_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"filterchain-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 13} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


# -- ToUnicode CMap pathology fuzz --------------------------------------------
#
# The reference's CMap parser (font/cmap.rs) is substring-driven and
# junk-tolerant in very specific ways our port must replicate bit for
# bit: hex values keep only hexdigits until '>' and OVERFLOW TO 0 past
# four digits (u16 from_str_radix unwrap_or(0)); surrogate/invalid dst
# codepoints are skipped (char::from_u32); the single-dst bfrange adds
# with u16 WRAPPING (release build, no overflow checks), and the
# array-form src walk wraps too — a wrapped src can re-enter the
# src<=hi window and insert a LOW cid.  Random cmaps below hit all of
# those plus multi-section, comment-laced, and unterminated shapes.


def gen_cmap_pathology_pdf(rng: random.Random) -> bytes:
    parts = [b"/CIDInit /ProcSet findresource begin\nbegincmap\n"]
    cids_used = []

    def hx(v: int, junk: bool) -> bytes:
        s = b"%04X" % (v & 0xFFFF)
        if junk and rng.random() < 0.5:
            s = s[:2] + rng.choice([b" ", b"\n", b"zz", b"--"]) + s[2:]
        if rng.random() < 0.1:
            s = b"00" + s  # >4 digits -> reference parses 0
        return b"<" + s + b">"

    for _ in range(rng.randint(1, 4)):
        kind = rng.choice(["bfchar", "range1", "rangearr"])
        if kind == "bfchar":
            n = rng.randint(1, 4)
            sec = [b"%d beginbfchar\n" % n]
            for _ in range(n):
                src = rng.randint(1, 0xFFFF)
                dst = rng.choice(
                    [rng.randint(0x21, 0x7E), 0xD800 + rng.randint(0, 0x7FF),
                     rng.randint(0x3000, 0x30FF)]
                )
                sec.append(hx(src, True) + b" " + hx(dst, True) + b"\n")
                cids_used.append(src)
            sec.append(b"endbfchar\n")
        elif kind == "range1":
            lo = rng.randint(1, 0xFFF0)
            hi = lo + rng.randint(0, 12)
            dst = rng.choice([rng.randint(0x21, 0x7E),
                              0xFFFA + rng.randint(0, 5),  # dst wrap zone
                              0xD7FA + rng.randint(0, 10)])  # surrogate edge
            sec = [b"1 beginbfrange\n",
                   hx(lo, False) + b" " + hx(hi, False) + b" "
                   + hx(dst, False) + b"\n", b"endbfrange\n"]
            cids_used.extend(range(lo, min(hi, lo + 12) + 1))
        else:
            lo = rng.choice([rng.randint(1, 0xFF00), 0xFFFE])  # src wrap zone
            hi = min(0xFFFF, lo + rng.randint(0, 6))
            dsts = [rng.randint(0x21, 0x7E) for _ in range(rng.randint(1, 8))]
            sec = [b"1 beginbfrange\n", hx(lo, False) + b" " + hx(hi, False)
                   + b" [" + b" ".join(hx(d, False) for d in dsts) + b"]\n",
                   b"endbfrange\n"]
            cids_used.extend(range(lo, hi + 1))
        parts.extend(sec)
        if rng.random() < 0.3:
            parts.append(b"%% stray comment with beginbfchar inside? no: ")
            parts.append(rng.choice([b"\n", b" endbfchar\n", b" <dead>\n"]))
    if rng.random() < 0.15:
        parts.append(b"3 beginbfchar\n<0099> <0050>\n")  # unterminated
    else:
        parts.append(b"endcmap end\n")
    cmap = b"".join(parts)

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    probe = rng.sample(cids_used, min(len(cids_used), 12)) + [0, 1, 0xFFFF]
    content = (b"BT /F1 12 Tf 72 720 Td <"
               + b" ".join(b"%04X" % (c & 0xFFFF) for c in probe)
               + b"> Tj ET")
    b.add_stream(4, b"", content)
    b.add(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Fz /ToUnicode 6 0 R >>")
    b.add_stream(6, b"", cmap)
    return b.build()


def test_fuzz_cmap_pathology_byte_identity(ref_bin):
    rng = random.Random(SEED + 17)
    for doc_i in range(150):
        data = gen_cmap_pathology_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"cmap-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 17} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:6000] + "\n")
        assert not diffs, diffs[:5]


# -- font /Encoding shape fuzz ------------------------------------------------
#
# document.rs:803-833: /Encoding may be a NAME (WinAnsi / MacRoman /
# anything-else->WinAnsi), a DICT (BaseEncoding honored, Differences
# array an acknowledged TODO — IGNORED), or any other object shape
# (falls through to default WinAnsi without resolving refs).  High
# bytes in the strings make the chosen table observable.


def gen_encoding_shape_pdf(rng: random.Random) -> bytes:
    shape = rng.choice(["winansi", "macroman", "unknown-name", "dict-win",
                        "dict-mac", "dict-nobase", "dict-diffs", "ref",
                        "number", "absent"])
    if shape == "winansi":
        enc = b" /Encoding /WinAnsiEncoding"
    elif shape == "macroman":
        enc = b" /Encoding /MacRomanEncoding"
    elif shape == "unknown-name":
        enc = b" /Encoding /PDFDocEncoding"
    elif shape == "dict-win":
        enc = b" /Encoding << /BaseEncoding /WinAnsiEncoding >>"
    elif shape == "dict-mac":
        enc = b" /Encoding << /BaseEncoding /MacRomanEncoding >>"
    elif shape == "dict-nobase":
        enc = b" /Encoding << /Type /Encoding >>"
    elif shape == "dict-diffs":
        # Differences MUST be ignored (reference TODO document.rs:825)
        base = rng.choice([b"/WinAnsiEncoding", b"/MacRomanEncoding"])
        enc = (b" /Encoding << /BaseEncoding " + base
               + b" /Differences [ 65 /alpha 66 /beta 150 /gamma ] >>")
    elif shape == "ref":
        enc = b" /Encoding 9 0 R"  # indirect: both engines fall to WinAnsi
    elif shape == "number":
        enc = b" /Encoding 7"
    else:
        enc = b""

    # high bytes where WinAnsi and MacRoman genuinely differ
    # (0x80-0x9F smart quotes / dagger zone, 0xA0-0xFF accents)
    high = bytes(rng.choice(range(0x80, 0x100)) for _ in range(10))
    text = b"lo " + bytes(
        b if b not in b"()\\" else 0x61 for b in high
    ) + b" hi"

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    content = b"BT /F1 12 Tf 50 700 Td (" + text + b") Tj ET"
    b.add_stream(4, b"", content)
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica" + enc + b" >>")
    if shape == "ref":
        b.add(9, b"<< /BaseEncoding /MacRomanEncoding >>")
    return b.build()


def test_fuzz_encoding_shapes_byte_identity(ref_bin):
    rng = random.Random(SEED + 19)
    for doc_i in range(120):
        data = gen_encoding_shape_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"encshape-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 19} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


# -- hybrid-reference files: classic xref + trailer /XRefStm -----------------
#
# PDF 1.5 hybrid-reference files carry a classic xref table whose
# trailer also points at an xref STREAM via /XRefStm (spec §7.5.8.4).
# The reference walks only startxref -> classic table -> /Prev
# (document.rs:89-120) and never reads the /XRefStm key, so the
# stream's entries are dead weight: a shadow "4 0 obj" with different
# content, or a font object that exists only through the stream, must
# not change the output.  Our engine ignores /XRefStm by construction;
# this class pins that the IGNORING is byte-identical — if either side
# ever honored the stream, the conflicting shadow content (or the
# phantom font's decode) would flip the text.


def gen_hybrid_xrefstm_pdf(rng: random.Random) -> bytes:
    fonts = [b"F1"]
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    def stream_body(payload: bytes) -> bytes:
        return (b"<< /Length %d >>\nstream\n" % len(payload)
                + payload + b"\nendstream")

    content_a = _content_stream(rng, fonts)   # the classic truth
    content_b = _content_stream(rng, fonts)   # only via /XRefStm

    phantom_font = rng.random() < 0.35
    font_ref = b"9 0 R" if phantom_font else b"5 0 R"
    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 %s >> >> >>"
            % font_ref)
    emit(4, stream_body(content_a))
    emit(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
            % rng.choice(ENCODINGS))

    # shadow revision of object 4 — reachable ONLY through the stream
    shadow_off = len(out)
    out.extend(b"4 0 obj\n" + stream_body(content_b) + b"\nendobj\n")
    # font 9 exists ONLY through the stream: with phantom_font the page
    # references it, and both engines must silently skip the
    # unresolvable font (document.rs:775-777) -> default decode
    nine_off = len(out)
    out.extend(b"9 0 obj\n<< /Type /Font /Subtype /Type1 "
               b"/BaseFont /Courier%s >>\nendobj\n" % rng.choice(ENCODINGS))
    xs_off = len(out)
    out.extend(_xref_stream(
        rng, 7,
        [(4, [(1, shadow_off, 0)]), (9, [(1, nine_off, 0)])],
        10, None, trunc_last=False,
    ))

    xref_off = len(out)
    maxnum = 5 if rng.random() < 0.5 else 7   # sometimes list the stream obj
    out.extend(b"xref\n0 %d\n" % (maxnum + 1))
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, maxnum + 1):
        if num <= 5:
            out.extend(b"%010d 00000 n \n" % offsets[num])
        elif num == 7:
            out.extend(b"%010d 00000 n \n" % xs_off)
        else:
            out.extend(b"0000000000 65535 f \n")
    # 20%: /XRefStm points into the void — must be ignored harmlessly
    xs_val = xs_off if rng.random() < 0.8 else len(out) + rng.randint(1, 5000)
    out.extend(b"trailer\n<< /Size %d /Root 1 0 R /XRefStm %d >>\n"
               b"startxref\n%d\n%%%%EOF\n" % (maxnum + 1, xs_val, xref_off))
    return bytes(out)


def test_fuzz_hybrid_xrefstm_byte_identity(ref_bin):
    rng = random.Random(SEED + 23)
    for doc_i in range(120):
        data = gen_hybrid_xrefstm_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"hybrid-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 23} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


# -- xref /Prev chain cycles --------------------------------------------------
#
# parse_xref_and_trailer (document.rs:89-137) follows /Prev with no
# visited-offset set: a trailer whose /Prev points back at an
# already-walked table re-parses it forever.  Hostile bytes at crawl
# scale cannot be allowed to pin an executor, so OUR walk keeps a
# seen-offsets guard (engine/document.py) and must finish instantly
# with the document intact.  (Like the stray-bracket pin, this is not
# run against the binary — it would hang the suite; the code-level
# cause is cited instead.)


def _single_page_pdf_bytes() -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R] /Count 1 >>")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    b.add(10, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
          b"/Contents 30 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    b.add_stream(30, b"", b"BT /F1 12 Tf 50 700 Td (alive) Tj ET", None)
    return b.build()


def test_prev_chain_self_loop_we_terminate():
    import re
    import time

    data = _single_page_pdf_bytes()
    xref_off = int(re.search(rb"startxref\n(\d+)\n", data).group(1))
    # trailer /Prev pointing at its OWN table
    data = data.replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Prev %d >>" % xref_off
    )
    t0 = time.time()
    out = api.pdf_to_text(data)
    assert time.time() - t0 < 5.0
    assert "alive" in out


def test_prev_chain_two_table_loop_we_terminate():
    import re
    import time

    data = _single_page_pdf_bytes()
    xref1 = int(re.search(rb"startxref\n(\d+)\n", data).group(1))
    # grab table 1's full "xref ... trailer << ... >>" block
    trailer_end = data.index(b">>", data.index(b"trailer")) + 2
    block = data[xref1:trailer_end]
    # table 1 gets /Prev -> table 2 (fixed-width so offsets below hold)
    patched = data[:trailer_end].replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Prev %010d >>" % 0, 1
    )
    xref2 = len(patched)
    patched = patched.replace(
        b"/Prev %010d >>" % 0, b"/Prev %010d >>" % xref2, 1
    )
    assert len(patched) == xref2
    # table 2 is a copy whose /Prev points back at table 1
    block2 = block.replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Prev %d >>" % xref1, 1
    )
    data = (patched + block2
            + b"\nstartxref\n%d\n%%%%EOF\n" % xref1)
    t0 = time.time()
    out = api.pdf_to_text(data)
    assert time.time() - t0 < 5.0
    assert "alive" in out


# -- encrypted-shaped PDFs ----------------------------------------------------
#
# The reference has NO /Encrypt handling (no occurrence anywhere in
# src/): an encrypted PDF walks the normal xref/object path and its
# content streams are decoded/interpreted as opaque bytes.  We mirror
# that exactly, so the gate is byte-identity over documents carrying
# an /Encrypt trailer entry with (a) plaintext streams ("encrypted"
# flag but readable bodies — common for mislabeled files), (b) garbage
# bytes behind /FlateDecode (decode error path), (c) raw garbage fed
# straight to the content interpreter (totality of operand skipping).
#
# Raw garbage is stripped of ']' and '>' — a stray one at top level
# hangs the REFERENCE forever (content/parser.rs:295: parse_operand
# returns None without advancing pos); test_reference_hangs_on_stray_
# close_bracket pins that divergence (we terminate).

_ENCRYPT_DICTS = [
    b"<< /Filter /Standard /V 1 /R 2 /O (0123456789abcdef0123456789abcdef)"
    b" /U (0123456789abcdef0123456789abcdef) /P -44 >>",
    b"<< /Filter /Standard /V 2 /R 3 /Length 128 /O <41424344> /U <45464748>"
    b" /P -3904 >>",
    b"<< /Filter /Standard /V 4 /R 4 /CF << /StdCF << /CFM /AESV2 >> >>"
    b" /StmF /StdCF /StrF /StdCF >>",
    b"<< /V 1 >>",  # degenerate: missing everything
]


def _garbage(rng: random.Random, n: int, raw_safe: bool) -> bytes:
    data = bytes(rng.randrange(256) for _ in range(n))
    if raw_safe:
        # drop the two bytes whose top-level occurrence hangs the
        # reference's content parser (see module comment above)
        data = data.replace(b"]", b"").replace(b">", b"")
    return data


def gen_encrypted_pdf(rng: random.Random) -> bytes:
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    mode = rng.random()
    if mode < 0.35:
        # plaintext body despite the encryption dict
        b.add_stream(4, b"", _content_stream(rng, [b"F1"]))
    elif mode < 0.60:
        # "encrypted" bytes behind Flate: decode-error path
        b.add_stream(4, b"", _garbage(rng, rng.randint(20, 120), False),
                     b"/FlateDecode")
    elif mode < 0.85:
        # raw "encrypted" bytes straight into the interpreter
        b.add_stream(4, b"", _garbage(rng, rng.randint(20, 120), True))
    else:
        # hex-wrapped garbage: decodes fine, interprets as noise
        g = _garbage(rng, rng.randint(20, 80), True)
        b.add_stream(4, b"", g.hex().upper().encode() + b">",
                     b"/ASCIIHexDecode")
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s >>"
          % rng.choice(ENCODINGS))
    enc = rng.choice(_ENCRYPT_DICTS)
    if rng.random() < 0.5:
        b.add(9, enc)
        entry = b"/Encrypt 9 0 R"
    else:
        entry = b"/Encrypt " + enc
    data = b.build()
    return data.replace(b"trailer\n<<", b"trailer\n<< " + entry, 1)


def test_fuzz_encrypted_byte_identity(ref_bin):
    rng = random.Random(SEED + 2)
    for doc_i in range(60):
        data = gen_encrypted_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"enc-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 2} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_reference_hangs_on_stray_close_bracket(ref_bin):
    """Divergence pin: a stray top-level ']' in a content stream makes
    the reference spin forever (content/parser.rs:295 returns None
    without advancing); our interpreter skips it and terminates."""
    import time

    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    b.add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
             b"/Contents 4 0 R >>")
    b.add_stream(4, b"", b"] BT (alive) Tj ET")
    data = b.build()

    t0 = time.time()
    out = api.pdf_to_text(data)
    assert time.time() - t0 < 5.0  # we terminate...
    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        import subprocess as sp
        with pytest.raises(sp.TimeoutExpired):  # ...the reference does not
            sp.run([ref_bin, path, "--txt"], capture_output=True, timeout=3)
    finally:
        os.unlink(path)


# -- linearized-shaped PDFs ---------------------------------------------------
#
# Linearization (PDF 1.2 annex F) puts a parameter dict + a first-page
# xref section at the FRONT of the file; the trailing startxref points
# at that front table, whose trailer /Prev points at the main table
# near the end.  Parsers must (1) ignore the linearization dict and
# hint offsets entirely, (2) walk the Prev chain with newest-wins
# object resolution — the fuzz plants DIFFERENT copies of the content
# stream behind each table so any wrong-direction resolution changes
# the extracted bytes.


def _xref_section(subsections: list[tuple[int, list[int | None]]],
                  trailer: bytes) -> bytes:
    """Classic xref table: [(start, [offset|None free, ...]), ...]."""
    out = b"xref\n"
    for start, offs in subsections:
        out += b"%d %d\n" % (start, len(offs))
        for off in offs:
            if off is None:
                out += b"0000000000 65535 f \n"
            else:
                out += b"%010d 00000 n \n" % off
    return out + b"trailer\n" + trailer + b"\n"


def gen_linearized_pdf(rng: random.Random) -> bytes:
    content_a = _content_stream(rng, [b"F1"])
    content_b = _content_stream(rng, [b"F1"])

    def stream_obj(num: int, payload: bytes, compress: bool) -> bytes:
        if compress:
            data = zlib.compress(payload)
            return (b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\n"
                    b"stream\n" % (num, len(data)) + data
                    + b"\nendstream\nendobj\n")
        return (b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num, len(payload))
                + payload + b"\nendstream\nendobj\n")

    comp = rng.random() < 0.5
    out = bytearray(b"%PDF-1.4\n")

    # linearization parameter dict (values sometimes deliberately
    # bogus — conforming readers may use them only as hints)
    lin_vals = (rng.randint(0, 9999), rng.randint(0, 9999),
                rng.randint(0, 9999), rng.randint(0, 9999))
    out += (b"7 0 obj\n<< /Linearized 1 /L %d /H [%d %d] /O 3 /E %d /N 1 "
            b"/T %d >>\nendobj\n" % ((len(out),) + lin_vals))

    # stale copy of the content stream (main xref will point here)
    off_4a = len(out)
    out += stream_obj(4, content_a, comp)

    # front xref: covers object 4 with the AUTHORITATIVE copy (4b,
    # offset known only later — patch a fixed-width placeholder)
    front_xref_off = len(out)
    placeholder = 0
    front_sections = [(4, [placeholder])]
    if rng.random() < 0.5:
        front_sections.insert(0, (0, [None]))  # free-list subsection
    front_trailer_fmt = (b"<< /Size 10 /Root 1 0 R /Prev %010d >>")
    front = _xref_section(front_sections, front_trailer_fmt % 0)
    out += front
    if rng.random() < 0.5:
        out += b"startxref\n0\n%%EOF\n"  # annex-F front mini-trailer

    # body
    offs = {}
    offs[1] = len(out)
    out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    offs[2] = len(out)
    out += b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    offs[3] = len(out)
    out += (b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\n"
            b"endobj\n")
    offs[5] = len(out)
    out += (b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica%s"
            b" >>\nendobj\n" % rng.choice(ENCODINGS))
    off_4b = len(out)
    out += stream_obj(4, content_b, comp)

    # main xref: full table, object 4 -> the STALE copy
    main_xref_off = len(out)
    # object 7 (lin dict) listed in the main table half the time; its
    # true offset is 9 (right after the header) and nothing references
    # it, so either way the resolver must not care
    obj7 = 9 if rng.random() < 0.5 else None
    main_sections = [(0, [None, offs[1], offs[2], offs[3], off_4a, offs[5],
                          None, obj7])]
    out += _xref_section(main_sections, b"<< /Size 10 /Root 1 0 R >>")
    out += b"startxref\n%d\n%%%%EOF\n" % front_xref_off

    # patch the front trailer's /Prev with the real main-table offset
    final = bytes(out).replace(front_trailer_fmt % 0,
                               front_trailer_fmt % main_xref_off, 1)
    assert len(final) == len(out)
    return final


def test_fuzz_linearized_byte_identity(ref_bin):
    rng = random.Random(SEED + 3)
    for doc_i in range(60):
        data = gen_linearized_pdf(rng)
        diffs = _run_diff(ref_bin, data, f"lin-{doc_i}")
        if diffs:
            sys.stderr.write(f"repro: seed={SEED + 3} doc={doc_i}\n")
            sys.stderr.write(data.hex()[:4000] + "\n")
        assert not diffs, diffs[:5]


def test_linearized_front_table_wins():
    """Deterministic pin of newest-wins across the linearized Prev
    chain: the front table's copy of the content stream (B) is the one
    extracted, not the main table's stale copy (A)."""
    rng = random.Random(99)
    data = gen_linearized_pdf(rng)
    # rebuild the two content payloads the same way the generator did
    rng2 = random.Random(99)
    content_a = _content_stream(rng2, [b"F1"])
    content_b = _content_stream(rng2, [b"F1"])
    assert content_a != content_b
    out = api.pdf_to_text(data)
    # cheap containment signal: a literal word that appears only in B
    import re as _re
    words_b = set(_re.findall(r"[A-Za-z0-9:.\-_]{3,}", content_b.decode("latin1")))
    words_a = set(_re.findall(r"[A-Za-z0-9:.\-_]{3,}", content_a.decode("latin1")))
    only_b = {w for w in words_b - words_a if w in out}
    only_a = {w for w in words_a - words_b if w in out}
    assert not only_a, only_a


# -- mutation differential fuzz ----------------------------------------------
#
# Bit-flip / byte-substitute real PDFs and demand the two engines STILL
# agree byte-for-byte — on the output when both parse, and on the
# error verdict when either rejects.  Mutations reach states the
# constructive generators never produce (corrupted xref digits, broken
# dict tokens, mid-stream damage).  The one tolerated asymmetry is a
# reference HANG (it has known non-termination classes — stray
# top-level ']'/'>' in content, Prev-chain cycles — where we terminate
# by design); those are counted and skipped, and our engine is
# asserted to return promptly on the same input.
#
# The comparison target is api.pdf_extract — the CLI twin — NOT the
# lib.rs-twin functions in FN: the reference CLI SKIPS pages that fail
# to extract (main.rs:145-147) and maps a failed page count to zero
# pages (main.rs:86 unwrap_or), while the library propagates both.
# Mutation fuzzing is what first exposed the difference (a corrupted
# page-1 Flate stream in a 60-page document: the CLI emits the other
# 59 pages, the library twin errors the document).


def _mutate(rng: random.Random, base: bytes) -> bytes:
    data = bytearray(base)
    kind = rng.random()
    if kind < 0.45:
        for _ in range(rng.randint(1, 8)):
            i = rng.randrange(len(data))
            data[i] ^= 1 << rng.randrange(8)
    elif kind < 0.80:
        for _ in range(rng.randint(1, 4)):
            i = rng.randrange(len(data))
            data[i] = rng.randrange(256)
    else:
        # truncate somewhere in the tail half (keeps the header)
        data = data[: rng.randrange(len(data) // 2, len(data))]
    return bytes(data)


def test_fuzz_mutated_byte_identity(ref_bin):
    import subprocess as sp
    import time

    from fixtures.gen import PDF_CASES

    rng = random.Random(SEED + 4)
    bases = [fn() for fn in PDF_CASES.values()]
    gen_rng = random.Random(SEED + 5)
    bases += [gen_pdf(gen_rng) for _ in range(10)]

    fmts = [("txt", FLAG["txt"]), ("csv", FLAG["csv"])]
    diffs, ref_hangs = [], 0
    for doc_i, base in enumerate(bases):
        for mut_i in range(25):
            data = _mutate(rng, base)
            with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
                f.write(data)
                path = f.name
            try:
                for fmt, flag in fmts:
                    try:
                        r = sp.run([ref_bin, path, flag],
                                   capture_output=True, timeout=5)
                    except sp.TimeoutExpired:
                        # known reference non-termination class: we
                        # must still answer, fast
                        ref_hangs += 1
                        t0 = time.time()
                        try:
                            api.pdf_extract(data, fmt)
                        except PdfError:
                            pass
                        assert time.time() - t0 < 5.0
                        continue
                    try:
                        ours = api.pdf_extract(data, fmt) + "\n"
                    except PdfError:
                        ours = None
                    if r.returncode != 0:
                        if ours is not None:
                            diffs.append((doc_i, mut_i, fmt,
                                          "ref-failed-we-succeeded"))
                        continue
                    ref = r.stdout.decode("utf-8", "replace")
                    if ours is None:
                        ours = "\n"
                    if ref != ours:
                        diffs.append((doc_i, mut_i, fmt,
                                      repr(ref[:60]), repr(ours[:60])))
            finally:
                os.unlink(path)
            if diffs:
                sys.stderr.write(
                    f"repro: seed={SEED + 4} doc={doc_i} mut={mut_i}\n"
                )
                sys.stderr.write(data.hex()[:4000] + "\n")
                break
        if diffs:
            break
    assert not diffs, diffs[:5]
    sys.stderr.write(f"[mutation fuzz] reference hangs skipped: {ref_hangs}\n")


def test_cli_skips_failing_page_library_propagates(ref_bin):
    """Deterministic pin of the CLI-vs-library split the mutation fuzz
    exposed: a 3-page document whose MIDDLE page's Flate stream is
    corrupted.  The CLI twin (pdf_extract) must emit pages 1 and 3
    byte-identically to the binary — no separator for the dead page —
    while the lib.rs twin (pdf_to_text) propagates the decode error."""
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [10 0 R 11 0 R 12 0 R] /Count 3 >>")
    for i, (num, word) in enumerate([(10, b"alpha"), (11, b"beta"),
                                     (12, b"gamma")]):
        b.add(num, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
              b"/Contents %d 0 R >>" % (30 + i))
        payload = zlib.compress(b"BT 72 700 Td (%s page) Tj ET" % word)
        if num == 11:
            payload = payload[:-4] + b"\x00\x00\x00\x00"  # break the adler
        b.add_stream(30 + i, b"", payload, b"/FlateDecode")
    data = b.build()

    with pytest.raises(PdfError):
        api.pdf_to_text(data)

    ours = api.pdf_extract(data, "txt")
    assert "alpha page" in ours and "gamma page" in ours
    assert "beta" not in ours

    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        import subprocess as sp

        r = sp.run([ref_bin, path, "--txt"], capture_output=True, timeout=30)
        assert r.returncode == 0
        assert r.stdout.decode() == ours + "\n"
    finally:
        os.unlink(path)


def test_cli_maps_failed_page_count_to_empty(ref_bin):
    """main.rs:86 unwrap_or(0): parseable xref but unwalkable page
    tree (/Root points at a missing object) → CLI prints empty and
    exits 0; ours must match through pdf_extract."""
    b = PdfBuilder()
    # no object 1: the trailer's /Root dangles
    b.add(2, b"<< /Type /Pages /Kids [] /Count 0 >>")
    data = b.build()

    ours = api.pdf_extract(data, "txt")
    assert ours == ""

    with tempfile.NamedTemporaryFile(suffix=".pdf", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        import subprocess as sp

        r = sp.run([ref_bin, path, "--txt"], capture_output=True, timeout=30)
        assert (r.returncode == 0) == True
        assert r.stdout.decode() == ours + "\n"
    finally:
        os.unlink(path)
