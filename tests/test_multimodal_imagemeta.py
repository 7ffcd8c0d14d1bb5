"""Real image-header metadata (ops/imagemeta.py): synthesized
header-true fixtures for PNG / APNG / JPEG / GIF (multi-frame) /
WebP (VP8, VP8L, VP8X animated), plus the corpus-safety property the
SQL oracle relies on (no document text dispatches to the real path)
and the ``_decode`` dispatch contract."""

import struct
import zlib

import duckdb
import pytest

from pdf_parser_spark.ops.imagemeta import parse_image_header
from pdf_parser_spark.ops.multimodal import _decode, _decode_stub


# ------------------------------------------------ fixture synthesizers


def make_png(w: int, h: int, frames: int = 1) -> bytes:
    def chunk(ctype: bytes, payload: bytes) -> bytes:
        raw = ctype + payload
        return struct.pack(">I", len(payload)) + raw + struct.pack(
            ">I", zlib.crc32(raw)
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
    if frames > 1:
        out += chunk(b"acTL", struct.pack(">II", frames, 0))
    out += chunk(b"IDAT", zlib.compress(b"\x00" * (w * 4 + 1) * h))
    out += chunk(b"IEND", b"")
    return out


def make_jpeg(w: int, h: int) -> bytes:
    out = b"\xff\xd8"                                   # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    out += (b"\xff\xc0" + struct.pack(">H", 11)         # SOF0
            + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    return out + b"\x00" * 16 + b"\xff\xd9"


def make_gif(w: int, h: int, frames: int = 1) -> bytes:
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
    for _ in range(frames):
        out += b"\x21\xf9\x04" + b"\x00" * 4 + b"\x00"  # GCE extension
        out += (b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
                + b"\x02"                                # LZW min code size
                + b"\x02\x44\x01"                        # one sub-block
                + b"\x00")                               # block terminator
    return out + b"\x3b"


def make_webp_vp8(w: int, h: int) -> bytes:
    body = (b"VP8 " + struct.pack("<I", 12)
            + b"\x00\x00\x00"                            # frame tag
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", w, h) + b"\x00\x00")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def make_webp_vp8l(w: int, h: int) -> bytes:
    bits = (w - 1) | ((h - 1) << 14)
    body = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack("<I", bits)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body + b"\x00"


def make_webp_vp8x(w: int, h: int, frames: int = 1) -> bytes:
    flags = 0x02 if frames > 1 else 0x00
    body = (b"VP8X" + struct.pack("<I", 10) + bytes([flags]) + b"\x00" * 3
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    if frames > 1:
        anmf = b"\x00" * 16
        for _ in range(frames):
            body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


# ------------------------------------------------------------- parsing


@pytest.mark.parametrize(
    "payload,want",
    [
        (make_png(640, 480), ("png", 640, 480, 1)),
        (make_png(1, 1), ("png", 1, 1, 1)),
        (make_png(320, 200, frames=7), ("png", 320, 200, 7)),
        (make_jpeg(1024, 768), ("jpeg", 1024, 768, 1)),
        (make_gif(99, 44), ("gif", 99, 44, 1)),
        (make_gif(16, 16, frames=5), ("gif", 16, 16, 5)),
        (make_webp_vp8(300, 150), ("webp", 300, 150, 1)),
        (make_webp_vp8l(77, 33), ("webp", 77, 33, 1)),
        (make_webp_vp8x(512, 256), ("webp", 512, 256, 1)),
        (make_webp_vp8x(64, 64, frames=4), ("webp", 64, 64, 4)),
    ],
)
def test_parse_real_headers(payload, want):
    assert parse_image_header(payload) == want


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"plain document text, nothing binary",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,              # truncated IHDR
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDX" + b"\x00" * 13,
        b"\xff\xd8\xff",                                  # SOI only
        b"\xff\xd8\xff\xe0\x00\x02",                      # no SOF before end
        b"GIF89a\x00\x00\x00\x00\x00\x00\x00",            # zero dims
        b"RIFF\x10\x00\x00\x00WAVEdata",                  # RIFF, not WEBP
        b"RIFF\x10\x00\x00\x00WEBPXXXX\x00\x00\x00\x00",  # unknown fourcc
        make_webp_vp8(3, 3)[:24],                         # truncated VP8
    ],
)
def test_parse_rejects_non_images(payload):
    assert parse_image_header(payload) is None


def test_jpeg_sof_variants_and_rst_markers():
    # SOF2 (progressive) and fill bytes before markers
    out = (b"\xff\xd8" + b"\xff\xff"                       # fill byte
           + b"\xff\xc2" + struct.pack(">H", 11)
           + b"\x08" + struct.pack(">HH", 120, 240) + b"\x01\x11\x00")
    assert parse_image_header(out) == ("jpeg", 240, 120, 1)
    # DHT (0xC4) must NOT be taken for a SOF
    out = (b"\xff\xd8"
           + b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
           + b"\xff\xc0" + struct.pack(">H", 11)
           + b"\x08" + struct.pack(">HH", 10, 20) + b"\x01\x11\x00")
    assert parse_image_header(out) == ("jpeg", 20, 10, 1)


# ---------------------------------------------------- dispatch contract


def test_decode_prefers_real_header_over_stub():
    img = make_png(800, 600)
    assert _decode(img) == ("png", 800, 600, 1)
    assert _decode(img) != _decode_stub(img)


def test_decode_falls_back_to_stub_for_unknown():
    payload = "some document text".encode()
    assert _decode(payload) == _decode_stub(payload)


def test_corpus_never_dispatches_to_real_path():
    """The SQL oracle is the stub arithmetic, so NO document text in
    the driver's testdata may start with an image magic reachable
    from UTF-8 (GIF8 / RIFF).  PNG and JPEG magics are structurally
    unreachable (0x89 / 0xFF cannot begin UTF-8 text)."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            f"SELECT count(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            f"WHERE text LIKE 'GIF8%' OR text LIKE 'RIFF%'"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} rows would bypass the stub oracle"
