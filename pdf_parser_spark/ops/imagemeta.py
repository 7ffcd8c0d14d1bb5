"""Real image metadata from container headers — pure stdlib.

The container has no codecs (no PIL/ffmpeg), but **dimensions and
frame counts live in the format headers**, which are fully parseable
with ``struct`` from the public format specs:

- PNG: IHDR chunk (ISO 15948 §11.2.2); APNG ``acTL`` frame count.
- JPEG: SOFn marker segment (ITU-T T.81 §B.2.2) via a marker walk.
- GIF: logical screen descriptor (GIF89a spec §18); frame count by
  walking image descriptors / extension sub-blocks.
- WebP: RIFF container with VP8 (lossy key-frame header), VP8L
  (lossless signature bits) and VP8X (extended header + ANMF frame
  chunks) — per the public WebP container spec.

This makes ``multimodal_features`` real for the image-metadata case;
only pixel DECODING remains stubbed (md5 fallback for unrecognized
payloads), since that genuinely needs codec libraries.
"""

from __future__ import annotations

import struct


def parse_image_header(data: bytes) -> tuple[str, int, int, int] | None:
    """(format, width, height, n_frames) from container headers, or
    None if the payload is not a recognized image format.  Never
    raises: malformed variants of a recognized magic return None too
    (callers fall back to their unknown-format path)."""
    try:
        if data.startswith(b"\x89PNG\r\n\x1a\n"):
            return _png(data)
        if data.startswith(b"\xff\xd8\xff"):
            return _jpeg(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return _gif(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            return _webp(data)
    except (struct.error, IndexError, ValueError):
        return None
    return None


def _png(data: bytes) -> tuple[str, int, int, int] | None:
    # first chunk must be IHDR: len(4) type(4) width(4) height(4) ...
    if data[12:16] != b"IHDR" or len(data) < 24:
        return None
    w, h = struct.unpack(">II", data[16:24])
    if not (0 < w < 1 << 31 and 0 < h < 1 << 31):
        return None
    # APNG: acTL chunk (must precede IDAT) carries num_frames
    n_frames = 1
    pos = 8
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"acTL" and pos + 12 <= len(data):
            (n,) = struct.unpack(">I", data[pos + 8 : pos + 12])
            n_frames = max(1, n)
            break
        if ctype == b"IDAT":
            break
        pos += 8 + clen + 4  # len + type + payload + crc
    return "png", w, h, n_frames


# SOF markers carry dimensions; DHT(0xC4)/JPG(0xC8)/DAC(0xCC) do not
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg(data: bytes) -> tuple[str, int, int, int] | None:
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None  # desynced marker stream
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no length field
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            return None
        if marker in _JPEG_SOF:
            if pos + 9 > n:
                return None
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            if w == 0 or h == 0:
                return None
            return "jpeg", w, h, 1
        if marker == 0xDA:  # SOS: entropy data follows; SOF must precede
            return None
        pos += 2 + seglen
    return None


def _gif(data: bytes) -> tuple[str, int, int, int] | None:
    if len(data) < 13:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        return None
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x2C:  # image descriptor
            n_frames += 1
            if pos + 10 > n:
                break
            lflags = data[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = _skip_subblocks(data, pos)
        elif b == 0x21:  # extension: label + sub-blocks
            pos = _skip_subblocks(data, pos + 2)
        else:
            break  # corrupt block stream: keep what we counted
    return "gif", w, h, max(1, n_frames)


def _skip_subblocks(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        size = data[pos]
        pos += 1
        if size == 0:
            break
        pos += size
    return pos


def _webp(data: bytes) -> tuple[str, int, int, int] | None:
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        # lossy: 3-byte frame tag, then start code 9D 01 2A, then
        # 14-bit width/height (little-endian u16, low 14 bits)
        if data[23:26] != b"\x9d\x01\x2a" or len(data) < 30:
            return None
        (w,) = struct.unpack("<H", data[26:28])
        (h,) = struct.unpack("<H", data[28:30])
        return "webp", (w & 0x3FFF) or 1, (h & 0x3FFF) or 1, 1
    if fourcc == b"VP8L":
        if len(data) < 25 or data[20] != 0x2F:
            return None
        (bits,) = struct.unpack("<I", data[21:25])
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return "webp", w, h, 1
    if fourcc == b"VP8X":
        if len(data) < 30:
            return None
        flags = data[20]
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        n_frames = 1
        if flags & 0x02:  # animation: count ANMF chunks
            n_frames = max(1, _count_riff_chunks(data, b"ANMF"))
        return "webp", w, h, n_frames
    return None


def _count_riff_chunks(data: bytes, fourcc: bytes) -> int:
    pos, n, count = 12, len(data), 0
    while pos + 8 <= n:
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if data[pos : pos + 4] == fourcc:
            count += 1
        pos += 8 + size + (size & 1)  # chunks pad to even
    return count
