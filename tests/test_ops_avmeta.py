"""MP4/WAV container metadata: struct-level round-trips, totality on
hostile bytes, corpus-magic unreachability (the stub SQL twin stays
authoritative for text payloads), and the frame_sample real-container
branch deriving timestamps from a real mvhd timeline."""

import struct

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pdf_parser_spark.ops.containermeta import (
    build_flac,
    build_mp3,
    build_mp4,
    build_wav,
    parse_container_header,
)


def test_mp4_round_trip():
    m = parse_container_header(build_mp4(125000, 1920, 1080))
    assert m == {"kind": "mp4", "duration_ms": 125000,
                 "width": 1920, "height": 1080}


def test_mp4_timescale_truncation_is_deterministic():
    # 1001 ms -> 600.6 -> 600 ticks -> 1000 ms: the documented
    # truncating round-trip the oracle mirrors
    m = parse_container_header(build_mp4(1001, 16, 16))
    assert m["duration_ms"] == (1001 * 600 // 1000) * 1000 // 600 == 1000


def test_mp4_version1_boxes():
    """64-bit mvhd/tkhd (version 1) parse too."""
    mvhd = (
        struct.pack(">I4s", 120, b"mvhd") + b"\x01\x00\x00\x00"
        + struct.pack(">QQIQ", 0, 0, 1000, 90_000)   # ts=1000, dur=90s
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2)
    )
    tkhd = (
        struct.pack(">I4s", 104, b"tkhd") + b"\x01\x00\x00\x07"
        + struct.pack(">QQIIQ", 0, 0, 1, 0, 90_000)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 640 << 16, 480 << 16)
    )
    trak = struct.pack(">I4s", 8 + len(tkhd), b"trak") + tkhd
    moov = struct.pack(
        ">I4s", 8 + len(mvhd) + len(trak), b"moov") + mvhd + trak
    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00" * 4
    m = parse_container_header(ftyp + moov)
    assert m == {"kind": "mp4", "duration_ms": 90_000,
                 "width": 640, "height": 480}


def test_wav_round_trip_and_duration_math():
    m = parse_container_header(build_wav(44100, 2, 16, 441000))
    assert m == {"kind": "wav", "duration_ms": 10000, "sample_rate": 44100,
                 "channels": 2, "bits": 16}
    m = parse_container_header(build_wav(22050, 1, 16, 12345))
    assert m["duration_ms"] == 12345 * 1000 // 22050


def test_mp3_round_trip_and_duration_math():
    m = parse_container_header(build_mp3(128, 44100, 2, 38))
    assert m == {"kind": "mp3", "duration_ms": 38 * 1152 * 1000 // 44100,
                 "sample_rate": 44100, "channels": 2, "bitrate_kbps": 128}
    m = parse_container_header(build_mp3(320, 32000, 1, 1))
    assert m == {"kind": "mp3", "duration_ms": 1152 * 1000 // 32000,
                 "sample_rate": 32000, "channels": 1, "bitrate_kbps": 320}


def test_mp3_corrupt_tail_counts_consistent_prefix():
    good = build_mp3(192, 48000, 2, 5)
    m = parse_container_header(good + b"\xff\xfbgarbage-not-a-frame")
    # the appended bytes are not a valid same-params frame header, so
    # the walk ends after the 5 real frames (never raises)
    assert m["duration_ms"] == 5 * 1152 * 1000 // 48000


def test_flac_round_trip_and_duration_math():
    m = parse_container_header(build_flac(48000, 2, 16, 480000))
    assert m == {"kind": "flac", "duration_ms": 10000, "sample_rate": 48000,
                 "channels": 2, "bits": 16}
    m = parse_container_header(build_flac(96000, 1, 16, 123457))
    assert m["duration_ms"] == 123457 * 1000 // 96000
    # 36-bit total-samples boundary
    m = parse_container_header(build_flac(44100, 2, 16, (1 << 36) - 1))
    assert m["duration_ms"] == ((1 << 36) - 1) * 1000 // 44100


def test_rejects_non_containers():
    for junk in (b"", b"RIFF", b"RIFFxxxxWAVE", b"xxxxftyp",
                 b"\x00" * 40, b"RIFF\x10\x00\x00\x00WAVEjunk",
                 b"fLaC", b"fLaC" + b"\x00" * 10,
                 b"\xff\xe0\x00\x00",          # free-format bitrate
                 b"\xff\xf0\xff\xff" * 4):     # bad indices
        assert parse_container_header(junk) is None


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=300))
def test_parser_total_on_arbitrary_bytes(data):
    r = parse_container_header(data)
    assert r is None or r["kind"] in ("mp4", "wav", "mp3", "flac")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_parser_total_on_magic_prefixed_garbage(data):
    for prefix in (b"\x00\x00\x00\x14ftyp", b"RIFF\xff\x00\x00\x00WAVE",
                   b"fLaC\x00\x00\x00\x22", b"\xff\xfb\x90\x00"):
        r = parse_container_header(prefix + data)
        assert r is None or isinstance(r.get("duration_ms"), int)


def test_corpus_never_parses_as_container():
    """Text payloads must keep falling through to the md5 stub so the
    frame_sample SQL twin stays authoritative: no document's UTF-8 can
    carry the MP4 ftyp-at-offset-4 or RIFF/WAVE framing."""
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            f"SELECT count(*) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            f"WHERE substr(text, 5, 4) = 'ftyp' "
            f"   OR (text LIKE 'RIFF%' AND substr(text, 9, 4) = 'WAVE')"
            f"   OR text LIKE 'fLaC%'"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} rows would bypass the stub oracle"


@pytest.fixture(scope="module")
def spark():
    from pdf_parser_spark.spark.session import build_session

    s = build_session("avmeta-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _ascii_safe_mp4(duration_ms: int, w: int, h: int) -> bytes:
    """build_mp4 output with a `free` box spliced into moov so every
    byte (including the moov size, 216 -> 256) stays < 0x80 and the
    container survives a text->utf-8 round trip."""
    raw = build_mp4(duration_ms, w, h)
    ftyp, moov = raw[:20], raw[20:]
    (msize,) = struct.unpack(">I", moov[:4])
    free = struct.pack(">I4s", 40, b"free") + b"A" * 32
    out = ftyp + struct.pack(">I", msize + 40) + moov[4:] + free
    assert all(b < 0x80 for b in out), "fixture must survive utf-8"
    return out


def test_frame_sample_uses_real_container_timeline(spark, tmp_path):
    """An all-ASCII MP4 (every byte < 0x80, so text.encode('utf-8')
    reproduces the container bytes exactly) must drive frame_sample
    from the real mvhd duration, not the md5 stub."""
    from pdf_parser_spark.ops.multimodal import (
        FRAME_FPS_MS,
        FRAME_STRIDE,
        multimodal_frame_sample,
    )

    # 816 ticks and 120x112 dims keep the payload bytes ASCII-safe
    mp4 = _ascii_safe_mp4(1360, 120, 112)
    text = mp4.decode("ascii")
    assert parse_container_header(text.encode("utf-8")) is not None

    spark.createDataFrame(
        [(0, text), (1, "plain text document")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = multimodal_frame_sample(spark, str(tmp_path)).collect()
    vid = sorted(
        (r.frame_idx, r.ts_ms) for r in rows if r.doc_id == 0
    )
    n_frames = 1360 // FRAME_FPS_MS  # 34 -> sampled 0,2,...,32
    assert vid == [
        (i, i * FRAME_FPS_MS) for i in range(0, n_frames, FRAME_STRIDE)
    ]
    # the text doc still follows the stub (1..4 frames)
    assert 1 <= len([r for r in rows if r.doc_id == 1]) <= 2


def test_frame_sample_fanout_capped_for_long_videos(spark, tmp_path):
    from pdf_parser_spark.ops.multimodal import (
        MAX_SAMPLED_FRAMES,
        multimodal_frame_sample,
    )

    mp4 = _ascii_safe_mp4(51200, 64, 64)  # 51.2 s = 30720 ticks
    spark.createDataFrame(
        [(0, mp4.decode("ascii"))], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = multimodal_frame_sample(spark, str(tmp_path)).collect()
    assert 0 < len(rows) <= MAX_SAMPLED_FRAMES
