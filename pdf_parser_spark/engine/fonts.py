"""Font encodings: code → Unicode tables and byte-string decoding.

Reimplements /root/reference/src/font/encoding.rs: WinAnsi (:32-84),
MacRoman (:87-139), identity (:19-29), CID maps from ToUnicode
(:142-147) and the 2-byte-with-1-byte-fallback decode loop
(:165-192).  The tables are module-level constants — built once per
Python worker, shared across all documents in an Arrow batch.
"""

from __future__ import annotations

import sys
from array import array

_NEEDS_BYTESWAP = sys.byteorder == "little"  # CIDs are big-endian


def _win_ansi_table() -> dict[int, str]:
    table = {i: chr(i) for i in range(0x20, 0x7F)}
    # cp1252 specials in 0x80-0x9F; 0x81 0x8D 0x8F 0x90 0x9D undefined —
    # exactly the 27 entries of encoding.rs:41-69
    for code, ch in {
        0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
        0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
        0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
        0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
        0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
        0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
        0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
    }.items():
        table[code] = ch
    for i in range(0xA0, 0x100):
        table[i] = chr(i)
    return table


def _mac_roman_table() -> dict[int, str]:
    table = {i: chr(i) for i in range(0x20, 0x7F)}
    # Full 128-entry high table of encoding.rs:96-129, extracted
    # verbatim (note 0xCA is a plain space and 0xD2/0xD3 plain ASCII
    # quotes in the reference — kept as-is for byte-identity).
    high = {
        0x80: 'Ä', 0x81: 'Å', 0x82: 'Ç', 0x83: 'É',
        0x84: 'Ñ', 0x85: 'Ö', 0x86: 'Ü', 0x87: 'á',
        0x88: 'à', 0x89: 'â', 0x8a: 'ä', 0x8b: 'ã',
        0x8c: 'å', 0x8d: 'ç', 0x8e: 'é', 0x8f: 'è',
        0x90: 'ê', 0x91: 'ë', 0x92: 'í', 0x93: 'ì',
        0x94: 'î', 0x95: 'ï', 0x96: 'ñ', 0x97: 'ó',
        0x98: 'ò', 0x99: 'ô', 0x9a: 'ö', 0x9b: 'õ',
        0x9c: 'ú', 0x9d: 'ù', 0x9e: 'û', 0x9f: 'ü',
        0xa0: '†', 0xa1: '°', 0xa2: '¢', 0xa3: '£',
        0xa4: '§', 0xa5: '•', 0xa6: '¶', 0xa7: 'ß',
        0xa8: '®', 0xa9: '©', 0xaa: '™', 0xab: '´',
        0xac: '¨', 0xad: '≠', 0xae: 'Æ', 0xaf: 'Ø',
        0xb0: '∞', 0xb1: '±', 0xb2: '≤', 0xb3: '≥',
        0xb4: '¥', 0xb5: 'µ', 0xb6: '∂', 0xb7: '∑',
        0xb8: '∏', 0xb9: 'π', 0xba: '∫', 0xbb: 'ª',
        0xbc: 'º', 0xbd: 'Ω', 0xbe: 'æ', 0xbf: 'ø',
        0xc0: '¿', 0xc1: '¡', 0xc2: '¬', 0xc3: '√',
        0xc4: 'ƒ', 0xc5: '≈', 0xc6: '∆', 0xc7: '«',
        0xc8: '»', 0xc9: '…', 0xca: ' ', 0xcb: 'À',
        0xcc: 'Ã', 0xcd: 'Õ', 0xce: 'Œ', 0xcf: 'œ',
        0xd0: '–', 0xd1: '—', 0xd2: '"', 0xd3: '"',
        0xd4: '‘', 0xd5: '’', 0xd6: '÷', 0xd7: '◊',
        0xd8: 'ÿ', 0xd9: 'Ÿ', 0xda: '⁄', 0xdb: '€',
        0xdc: '‹', 0xdd: '›', 0xde: 'ﬁ', 0xdf: 'ﬂ',
        0xe0: '‡', 0xe1: '·', 0xe2: '‚', 0xe3: '„',
        0xe4: '‰', 0xe5: 'Â', 0xe6: 'Ê', 0xe7: 'Á',
        0xe8: 'Ë', 0xe9: 'È', 0xea: 'Í', 0xeb: 'Î',
        0xec: 'Ï', 0xed: 'Ì', 0xee: 'Ó', 0xef: 'Ô',
        0xf0: '\uf8ff', 0xf1: 'Ò', 0xf2: 'Ú', 0xf3: 'Û',
        0xf4: 'Ù', 0xf5: 'ı', 0xf6: 'ˆ', 0xf7: '˜',
        0xf8: '¯', 0xf9: '˘', 0xfa: '˙', 0xfb: '˚',
        0xfc: '¸', 0xfd: '˝', 0xfe: '˛', 0xff: 'ˇ',
    }
    table.update(high)
    return table


def _identity_table() -> dict[int, str]:
    return {i: chr(i) for i in range(256)}


WIN_ANSI_TABLE = _win_ansi_table()
MAC_ROMAN_TABLE = _mac_roman_table()
IDENTITY_TABLE = _identity_table()


class FontEncoding:
    __slots__ = ("map", "cid_map", "_xlate")

    def __init__(self, byte_map: dict[int, str], cid_map: dict[int, str]):
        self.map = byte_map
        self.cid_map = cid_map
        # str.translate table for the simple-font path: latin-1 decode
        # maps byte b -> chr(b), exactly the reference's miss fallback
        # (encoding.rs:150-152), so only entries that differ from
        # chr(b) need translating.  Built lazily once per encoding.
        self._xlate: dict[int, str] | None = None

    @classmethod
    def identity(cls) -> "FontEncoding":
        return cls(IDENTITY_TABLE, {})

    @classmethod
    def win_ansi(cls) -> "FontEncoding":
        return cls(WIN_ANSI_TABLE, {})

    @classmethod
    def mac_roman(cls) -> "FontEncoding":
        return cls(MAC_ROMAN_TABLE, {})

    @classmethod
    def from_cid_map(cls, cid_map: dict[int, str]) -> "FontEncoding":
        # NOTE: byte map intentionally empty — single-byte fallback then
        # decodes each byte as itself (encoding.rs:142-151)
        return cls({}, cid_map)

    def decode_byte(self, byte: int) -> str:
        """Missing entries fall back to the raw byte as a code point
        (encoding.rs:150-152)."""
        return self.map.get(byte, chr(byte))

    def decode_cid(self, cid: int) -> str | None:
        return self.cid_map.get(cid)

    def has_cid_map(self) -> bool:
        return bool(self.cid_map)

    def add_cid_mapping(self, cid: int, ch: str) -> None:
        self.cid_map[cid] = ch

    def decode_bytes(self, raw: bytes) -> str:
        """CID fonts read 2-byte big-endian codes with a two-1-byte
        fallback on miss and a 1-byte tail (encoding.rs:165-192);
        simple fonts map per byte via a C-level str.translate."""
        if self.cid_map:
            if not len(raw) & 1:
                # fast path: even length, every CID mapped — one
                # C-level byteswapped uint16 view + dict.__getitem__
                # map; any miss (or odd tail) falls back to the exact
                # reference loop below
                cids = array("H")
                cids.frombytes(raw)
                if _NEEDS_BYTESWAP:
                    cids.byteswap()
                try:
                    return "".join(map(self.cid_map.__getitem__, cids))
                except KeyError:
                    pass
            out = []
            cid_map = self.cid_map
            byte_map = self.map
            i = 0
            n = len(raw)
            while i < n:
                if i + 1 < n:
                    cid = (raw[i] << 8) | raw[i + 1]
                    ch = cid_map.get(cid)
                    if ch is not None:
                        out.append(ch)
                    else:
                        out.append(byte_map.get(raw[i], chr(raw[i])))
                        out.append(byte_map.get(raw[i + 1], chr(raw[i + 1])))
                    i += 2
                else:
                    out.append(byte_map.get(raw[i], chr(raw[i])))
                    i += 1
            return "".join(out)
        xlate = self._xlate
        if xlate is None:
            byte_map = self.map
            xlate = self._xlate = {
                b: ch for b, ch in byte_map.items() if ch != chr(b)
            }
        return raw.decode("latin-1").translate(xlate)
