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
- MP3 (MPEG-1 Layer III, ISO/IEC 11172-3): frame-header sync walk —
  bitrate/sample-rate/channel-mode tables from the public spec, frame
  length 144·bitrate/rate(+padding), 1152 samples per frame; duration
  = frames·1152/rate.  The 0xFF sync byte never occurs in UTF-8, so
  the sniff is unreachable from decoded corpus text.
- FLAC (xiph.org format spec): ``fLaC`` magic + STREAMINFO block —
  20-bit sample rate, 3-bit channels−1, 36-bit total samples.

Frame/sample EXTRACTION still needs codecs and stays stubbed; the
metadata here is what a 100 TB multimodal curation pass actually
filters on (duration caps, resolution floors, sample-rate buckets).
"""

from __future__ import annotations

import struct


def parse_container_header(data: bytes) -> dict | None:
    """Container metadata dict or None if not a recognized container.

    MP4  → {kind: "mp4", duration_ms, width, height}
    WAV  → {kind: "wav", duration_ms, sample_rate, channels, bits}
    MP3  → {kind: "mp3", duration_ms, sample_rate, channels, bitrate_kbps}
    FLAC → {kind: "flac", duration_ms, sample_rate, channels, bits}
    Never raises on malformed variants of a recognized magic."""
    try:
        if len(data) >= 12 and data[4:8] == b"ftyp":
            return _mp4(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            return _wav(data)
        if data[:4] == b"fLaC":
            return _flac(data)
        if len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
            return _mp3(data)
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


# -- MP3 (MPEG-1 Layer III) ---------------------------------------------------

# public tables, ISO/IEC 11172-3: bitrate index -> kbps, rate index -> Hz
_MP3_BITRATE_KBPS = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_RATES = [44100, 48000, 32000]
_MP3_SAMPLES_PER_FRAME = 1152


def _mp3(data: bytes) -> dict | None:
    """Walk MPEG-1 Layer III frames from offset 0; duration from the
    frame count (CBR framing — each header is re-validated, so a
    corrupt tail just ends the walk instead of raising)."""
    n = len(data)
    pos = 0
    frames = 0
    sr = ch = br = None
    while pos + 4 <= n:
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        if (b1 >> 3) & 0x3 != 0x3 or (b1 >> 1) & 0x3 != 0x1:
            break  # not MPEG-1 / not Layer III
        bi = (b2 >> 4) & 0xF
        ri = (b2 >> 2) & 0x3
        if bi == 0 or bi == 0xF or ri == 3:
            break  # free-format / bad indices
        f_br = _MP3_BITRATE_KBPS[bi] * 1000
        f_sr = _MP3_RATES[ri]
        if frames == 0:
            br, sr = f_br, f_sr
            ch = 1 if ((b3 >> 6) & 0x3) == 0x3 else 2
        elif (f_br, f_sr) != (br, sr):
            break  # VBR / desynced: count only the consistent prefix
        padding = (b2 >> 1) & 0x1
        flen = 144 * f_br // f_sr + padding
        if flen <= 4:
            break
        frames += 1
        pos += flen
    if frames == 0 or not sr:
        return None
    return {
        "kind": "mp3",
        "duration_ms": frames * _MP3_SAMPLES_PER_FRAME * 1000 // sr,
        "sample_rate": sr,
        "channels": ch,
        "bitrate_kbps": br // 1000,
    }


def build_mp3(bitrate_kbps: int, sample_rate: int, channels: int,
              n_frames: int) -> bytes:
    """Minimal CBR MPEG-1 Layer III stream: n_frames frames of the
    spec frame length, zero-filled bodies (header-only metadata)."""
    bi = _MP3_BITRATE_KBPS.index(bitrate_kbps)
    ri = _MP3_RATES.index(sample_rate)
    hdr = bytes(
        [
            0xFF,
            0xE0 | (0x3 << 3) | (0x1 << 1) | 0x1,  # MPEG1, Layer III, no CRC
            (bi << 4) | (ri << 2),                 # no padding
            (0x3 if channels == 1 else 0x0) << 6,  # mono / stereo
        ]
    )
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (flen - 4)
    return frame * n_frames


# -- FLAC ----------------------------------------------------------------------

def _flac(data: bytes) -> dict | None:
    """fLaC magic + STREAMINFO (mandatory first metadata block)."""
    if len(data) < 8 + 34:
        return None
    if data[4] & 0x7F != 0:  # first block must be STREAMINFO (type 0)
        return None
    blen = int.from_bytes(data[5:8], "big")
    if blen < 34:
        return None
    si = data[8 : 8 + 34]
    packed = int.from_bytes(si[10:18], "big")
    sr = packed >> 44
    ch = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sr == 0:
        return None
    return {
        "kind": "flac",
        "duration_ms": total * 1000 // sr,
        "sample_rate": sr,
        "channels": ch,
        "bits": bits,
    }


def build_flac(sample_rate: int, channels: int, bits: int,
               total_samples: int) -> bytes:
    """Minimal FLAC: magic + last-block STREAMINFO (34 bytes)."""
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    si = (
        struct.pack(">HH", 4096, 4096)       # min/max block size
        + b"\x00" * 6                        # min/max frame size (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                       # md5 of unencoded audio
    )
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si


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
