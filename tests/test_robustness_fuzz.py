"""Property-based robustness: ``extract_document`` is TOTAL — any
byte string (arbitrary garbage or a bit-flipped real PDF) produces a
row-level result, never an exception, and the result is deterministic.
This is the 10^12-row contract: one malformed document must never kill
a task."""

import random

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from fixtures.gen import PDF_CASES  # noqa: E402
from pdf_parser_spark.engine import extract_document  # noqa: E402


@given(st.binary(max_size=4096))
@settings(max_examples=300, deadline=None)
def test_arbitrary_bytes_never_raise(data):
    r1 = extract_document(data)
    r2 = extract_document(data)
    assert isinstance(r1, dict)
    assert r1 == r2  # deterministic
    # a result is either text or a classified error, never silence+crash
    assert r1["error_kind"] is None or isinstance(r1["error_kind"], str)


def test_bitflipped_fixtures_never_raise():
    rng = random.Random(20260818)
    for name, fn in PDF_CASES.items():
        base = bytearray(fn())
        for _ in range(20):
            mutated = bytearray(base)
            for _flip in range(rng.randint(1, 8)):
                i = rng.randrange(len(mutated))
                mutated[i] ^= 1 << rng.randrange(8)
            r1 = extract_document(bytes(mutated))
            r2 = extract_document(bytes(mutated))
            assert isinstance(r1, dict), name
            assert r1 == r2, name


def test_truncations_never_raise():
    for name, fn in PDF_CASES.items():
        data = fn()
        for cut in (0, 1, 7, len(data) // 3, len(data) // 2, len(data) - 1):
            r = extract_document(data[:cut])
            assert isinstance(r, dict), (name, cut)
