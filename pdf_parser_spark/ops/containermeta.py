"""Real audio/video container metadata from headers — pure stdlib.

Same design as ops/imagemeta.py (round 4's image de-stub): the
container has no ffmpeg, but DURATION, DIMENSIONS and sample format
live in the container headers, parseable with ``struct`` from public
specs:

- MP4 / ISO BMFF (ISO/IEC 14496-12): box walk to ``moov`` →
  ``mvhd`` (timescale + duration → milliseconds) and the first
  ``trak``/``tkhd`` (16.16 fixed-point width/height).
- WAV (RIFF/WAVE, the Microsoft/IBM spec): ``fmt `` chunk (channels,
  sample rate, bits per sample, block align) + ``data`` chunk size →
  sample count → milliseconds.

Frame/sample EXTRACTION still needs codecs and stays stubbed; the
metadata here is what a 100 TB multimodal curation pass actually
filters on (duration caps, resolution floors, sample-rate buckets).
"""

from __future__ import annotations

import struct


def parse_container_header(data: bytes) -> dict | None:
    """Container metadata dict or None if not a recognized container.

    MP4 → {kind: "mp4", duration_ms, width, height}
    WAV → {kind: "wav", duration_ms, sample_rate, channels, bits}
    Never raises on malformed variants of a recognized magic."""
    try:
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return _mp4(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _wav(data)
    except (struct.error, IndexError, ValueError):
        return None
    return None


# -- MP4 / ISO BMFF -----------------------------------------------------------

def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end
            size = end - pos
        if size < hdr:
            return
        yield btype, pos + hdr, min(pos + size, end)
        pos += size


def _mp4(data: bytes) -> dict | None:
    out: dict = {"kind": "mp4", "duration_ms": None,
                 "width": None, "height": None}
    for btype, body, bend in _walk_boxes(data, 0, len(data)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in _walk_boxes(data, body, bend):
            if ctype == b"mvhd" and out["duration_ms"] is None:
                ver = data[cbody]
                if ver == 1:
                    ts, dur = struct.unpack(
                        ">IQ", data[cbody + 20 : cbody + 32]
                    )
                else:
                    ts, dur = struct.unpack(
                        ">II", data[cbody + 12 : cbody + 20]
                    )
                if ts > 0:
                    out["duration_ms"] = dur * 1000 // ts
            elif ctype == b"trak" and out["width"] is None:
                for ttype, tbody, _tend in _walk_boxes(data, cbody, cend):
                    if ttype != b"tkhd":
                        continue
                    ver = data[tbody]
                    off = tbody + (96 if ver == 1 else 84)
                    w, h = struct.unpack(">II", data[off - 8 : off])
                    out["width"], out["height"] = w >> 16, h >> 16
                    break
        if out["duration_ms"] is not None:
            return out
    return out if out["duration_ms"] is not None else None


def build_mp4(duration_ms: int, width: int, height: int,
              timescale: int = 600) -> bytes:
    """Minimal valid-for-metadata MP4: ftyp + moov(mvhd, trak(tkhd))."""
    dur_units = duration_ms * timescale // 1000
    mvhd = (
        struct.pack(">I4s", 108, b"mvhd")
        + b"\x00\x00\x00\x00"                       # version/flags
        + struct.pack(">IIII", 0, 0, timescale, dur_units)
        + struct.pack(">IH", 0x00010000, 0x0100)    # rate, volume
        + b"\x00" * 10                              # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24                              # pre_defined
        + struct.pack(">I", 2)                      # next_track_ID
    )
    tkhd = (
        struct.pack(">I4s", 92, b"tkhd")
        + b"\x00\x00\x00\x07"                       # version/flags
        + struct.pack(">IIIII", 0, 0, 1, 0, dur_units)
        + b"\x00" * 8                               # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)          # layer/alt/vol/res
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16)
    )
    trak = struct.pack(">I4s", 8 + len(tkhd), b"trak") + tkhd
    moov = struct.pack(">I4s", 8 + len(mvhd) + len(trak), b"moov") + mvhd + trak
    ftyp = struct.pack(">I4s", 20, b"ftyp") + b"isom" + b"\x00\x00\x02\x00" + b"isom"
    return ftyp + moov


_UNITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


# -- WAV ----------------------------------------------------------------------

def _wav(data: bytes) -> dict | None:
    pos, n = 12, len(data)
    fmt = None
    data_size = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if cid == b"fmt " and csize >= 16:
            _af, ch, sr, _br, ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8 : pos + 24]
            )
            fmt = (ch, sr, ba, bits)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks pad to even
    if fmt is None or data_size is None:
        return None
    ch, sr, ba, bits = fmt
    if sr == 0 or ba == 0:
        return None
    n_samples = data_size // ba
    return {
        "kind": "wav",
        "duration_ms": n_samples * 1000 // sr,
        "sample_rate": sr,
        "channels": ch,
        "bits": bits,
    }


def build_wav(sample_rate: int, channels: int, bits: int,
              n_samples: int) -> bytes:
    """Minimal WAV: RIFF/WAVE + fmt + a zero-filled data chunk header
    (payload truncated — metadata needs only the declared size)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        byte_rate, block_align, bits,
    )
    # declared data size is authoritative for duration; carry a small
    # real payload so the chunk walk sees well-formed framing
    payload = b"\x00" * min(data_size, 8)
    data_hdr = struct.pack("<4sI", b"data", data_size)
    riff_size = 4 + len(fmt) + len(data_hdr) + len(payload)
    return (
        struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE")
        + fmt + data_hdr + payload
    )
