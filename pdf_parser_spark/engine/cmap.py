"""ToUnicode CMap parsing (reference: /root/reference/src/font/cmap.rs).

Text-level scan for ``beginbfchar…endbfchar`` pairs (:19-59) and
``beginbfrange…endbfrange`` in both the increment form
``<lo><hi><dstLo>`` and the array form ``<lo><hi>[<d1><d2>…]``
(:62-153).  Hex values are parsed permissively — non-hex chars inside
``<…>`` are skipped, unparseable values become 0 (:156-171).
"""

from __future__ import annotations


def parse_tounicode_cmap(data: bytes) -> dict[int, str]:
    text = data.decode("utf-8", errors="replace")
    cid_map: dict[int, str] = {}
    _parse_sections(text, "beginbfchar", "endbfchar", _parse_bfchar, cid_map)
    _parse_sections(text, "beginbfrange", "endbfrange", _parse_bfrange, cid_map)
    return cid_map


def _parse_sections(text, begin, end, handler, cid_map) -> None:
    pos = 0
    while True:
        start = text.find(begin, pos)
        if start == -1:
            return
        body_start = start + len(begin)
        stop = text.find(end, body_start)
        if stop == -1:
            return
        handler(text[body_start:stop], cid_map)
        pos = stop + len(end)


class _Scanner:
    """Char-at-a-time cursor matching the reference's peekable-iterator
    scanning discipline (cmap.rs:36-153)."""

    __slots__ = ("text", "i")

    def __init__(self, text: str):
        self.text = text
        self.i = 0

    def next(self) -> str | None:
        if self.i >= len(self.text):
            return None
        c = self.text[self.i]
        self.i += 1
        return c

    def peek(self) -> str | None:
        return self.text[self.i] if self.i < len(self.text) else None

    def skip_until(self, targets: str) -> None:
        while self.i < len(self.text) and self.text[self.i] not in targets:
            self.i += 1

    def hex_value(self) -> int:
        """Consume until ``>``, keep hex digits, default 0
        (cmap.rs:156-171)."""
        out = []
        while self.i < len(self.text):
            c = self.text[self.i]
            if c == ">":
                self.i += 1
                break
            if c in "0123456789abcdefABCDEF":
                out.append(c)
            self.i += 1
        if not out:
            return 0
        val = int("".join(out), 16)
        # the reference parses into u16 — overflow yields 0 (cmap.rs:170)
        return val if val <= 0xFFFF else 0


def _put(cid_map: dict[int, str], src: int, dst: int) -> None:
    # char::from_u32 fails for surrogates/out-of-range → skip entry
    if 0 <= dst <= 0x10FFFF and not (0xD800 <= dst <= 0xDFFF):
        cid_map[src] = chr(dst)


def _parse_bfchar(section: str, cid_map: dict[int, str]) -> None:
    s = _Scanner(section)
    while True:
        c = s.next()
        if c is None:
            break
        if c == "<":
            src = s.hex_value()
            s.skip_until("<")
            if s.next() == "<":
                dst = s.hex_value()
                _put(cid_map, src, dst)


def _parse_bfrange(section: str, cid_map: dict[int, str]) -> None:
    s = _Scanner(section)
    while True:
        c = s.next()
        if c is None:
            break
        if c != "<":
            continue
        src_lo = s.hex_value()
        s.skip_until("<")
        if s.next() != "<":
            continue
        src_hi = s.hex_value()
        s.skip_until("<[")
        nxt = s.next()
        if nxt == "<":
            dst_lo = s.hex_value()
            # saturating span like the reference (cmap.rs:109)
            span = max(src_hi - src_lo, 0)
            for i in range(span + 1):
                # u16 wrapping on dst like the reference's release build
                _put(cid_map, src_lo + i, (dst_lo + i) & 0xFFFF)
        elif nxt == "[":
            dst_values = []
            while True:
                while s.peek() in (" ", "\n", "\r", "\t"):
                    s.next()
                p = s.peek()
                if p == "<":
                    s.next()
                    dst_values.append(s.hex_value())
                elif p == "]":
                    s.next()
                    break
                else:
                    break
            for i, dst in enumerate(dst_values):
                # the reference computes `src_lo + i as u16`, which
                # WRAPS in its release build (cmap.rs:142, overflow
                # checks off) — a wrapped src can pass `src <= src_hi`
                # and insert a low CID, so the mask is load-bearing
                src = (src_lo + i) & 0xFFFF
                if src <= src_hi:
                    _put(cid_map, src, dst)
