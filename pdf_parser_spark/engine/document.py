"""Document-level structure: xref/trailer walk, object resolution,
page tree, content concatenation, font-encoding loading.

Reimplements /root/reference/src/document.rs: the back-scan for
``startxref`` in the last 1 KB (:58-69), the Prev-chain walk over both
classic xref tables (:144-263) and PDF 1.5 xref streams (:298-446,
first-trailer-wins :109-111, don't-overwrite for stream entries
:399-402), object streams /ObjStm (:535-611), lazily-cached object
resolution (:471-532), recursive page collection that ignores the
``/Count`` field (:678-717), ``\\n``-joined Contents arrays
(:720-742), font-encoding loading with ToUnicode preference
(:757-834) and the fixed-tolerance simple text extractor (:837-885).
"""

from __future__ import annotations

from pdf_parser_spark.engine.cmap import parse_tounicode_cmap
from pdf_parser_spark.engine.content import ContentParser, TextSpan
from pdf_parser_spark.engine.errors import (
    InvalidStructure,
    InvalidXref,
    MissingEof,
    MissingHeader,
    ObjectNotFound,
    ParseError,
    PdfError,
)
from pdf_parser_spark.engine.filters import decode_stream
from pdf_parser_spark.engine.fonts import FontEncoding
from pdf_parser_spark.engine.objects import (
    Name,
    Ref,
    Stream,
    as_array,
    as_dict,
    as_int,
    as_name,
    as_ref,
)
from pdf_parser_spark.engine.parser import Parser, _WSC

import re as _re

# `num gen obj` header consumed in one C-level match (see resolve);
# boundary guards mirror the lexer: an int must not run into [0-9.],
# the `obj` keyword is a maximal alpha run
_OBJ_HDR_RE = _re.compile(
    _WSC + rb"([0-9]+)(?![0-9.])"
    + _WSC + rb"([0-9]+)(?![0-9.])"
    + _WSC + rb"obj(?![A-Za-z])"
)

# Strict spec-form classic-xref entry (see parse_traditional_xref):
# fixed-width fields + the standard 2-byte EOL forms.  The EOL
# alternation consumes exactly what _find_eol + _skip_eol would
# (longest first so ' \r\n' is not split); off-form lines fall back
# to the general per-line path.
_XREF_ENTRY_STRICT_RE = _re.compile(
    rb"([0-9]{10}) ([0-9]{5}) [nf](?: \r\n| \r| \n|\r\n|\r|\n)"
)


class XRefEntry:
    """(document.rs:12-19) — ``compressed`` means offset is an ObjStm
    number and generation the index within it."""

    __slots__ = ("offset", "generation", "in_use", "compressed")

    def __init__(self, offset: int, generation: int, in_use: bool, compressed: bool):
        self.offset = offset
        self.generation = generation
        self.in_use = in_use
        self.compressed = compressed


class Document:
    __slots__ = (
        "data", "xref", "trailer", "cache", "_pages", "_font_encs",
        "extended_filters",
    )

    def __init__(
        self,
        data: bytes,
        xref: dict,
        trailer: dict,
        extended_filters: bool = False,
    ):
        self.data = data
        self.xref = xref
        self.trailer = trailer
        self.cache: dict[Ref, object] = {}
        self._pages = None
        self._font_encs: dict[Ref, FontEncoding] = {}
        # opt-in LZW/A85/RunLength/predictor support (filters.py);
        # False keeps decode dispatch reference-exact
        self.extended_filters = extended_filters

    # -- construction ----------------------------------------------------

    @classmethod
    def parse(cls, data: bytes, extended_filters: bool = False) -> "Document":
        if not data.startswith(b"%PDF-"):
            raise MissingHeader("missing %PDF header")
        startxref_pos = find_startxref(data)
        xref_offset = parse_startxref(data, startxref_pos)
        xref, trailer = parse_xref_and_trailer(
            data, xref_offset, extended=extended_filters
        )
        return cls(data, xref, trailer, extended_filters=extended_filters)

    # -- object resolution -------------------------------------------------

    def resolve(self, ref: Ref):
        cached = self.cache.get(ref)
        if cached is not None:
            return cached
        entry = self.xref.get(ref.num)
        if entry is None:
            raise ObjectNotFound(f"Object not found: {ref.num} {ref.gen} R")

        if entry.compressed:
            obj = self._resolve_from_object_stream(entry.offset, entry.generation)
            self.cache[ref] = obj
            return obj

        parser = Parser(self.data)
        # expect: num gen obj <content> endobj.  Fast path: one C-level
        # match consumes the whole header (the token path spends ~7
        # Python token ops on the num/gen lookahead dance); any
        # off-pattern header (comments mid-header are covered by the
        # regex, signs/reals are not) falls back to the token path with
        # identical semantics and errors.
        m = _OBJ_HDR_RE.match(self.data, entry.offset)
        if (
            m is not None
            and int(m.group(1)) == ref.num
            and int(m.group(2)) < 2**63  # lexer rejects i64 overflow
        ):
            parser.seek(m.end())
        else:
            parser.seek(entry.offset)
            num = parser.parse_object()
            if not (
                isinstance(num, int) and not isinstance(num, bool) and num == ref.num
            ):
                raise ParseError(entry.offset, "Expected object number")
            gen = parser.parse_object()
            if not (isinstance(gen, int) and not isinstance(gen, bool)):
                raise ParseError(entry.offset, "Expected generation number")
        obj = parser.parse_object()
        if obj is None:
            raise ParseError(parser.position, "Expected object content")
        self.cache[ref] = obj
        return obj

    def _resolve_from_object_stream(self, stream_num: int, index: int):
        """Type-2 entries: object lives inside a compressed /ObjStm
        (document.rs:535-611)."""
        stream_obj = self.resolve(Ref(stream_num, 0))
        if not isinstance(stream_obj, Stream):
            raise InvalidStructure("Object stream is not a stream")
        decoded = decode_stream(
            stream_obj.dict, stream_obj.data, extended=self.extended_filters
        )
        n = as_int(stream_obj.dict.get("N"))
        if n is None:
            raise InvalidStructure("ObjStm missing /N")
        first = as_int(stream_obj.dict.get("First"))
        if first is None:
            raise InvalidStructure("ObjStm missing /First")
        if index >= n:
            raise InvalidStructure(f"ObjStm index {index} out of range (N={n})")

        header = Parser(decoded)
        offsets = []
        for _ in range(n):
            obj_num = header.parse_object()
            if not isinstance(obj_num, int) or isinstance(obj_num, bool):
                raise InvalidStructure("Invalid ObjStm header")
            byte_offset = header.parse_object()
            if not isinstance(byte_offset, int) or isinstance(byte_offset, bool):
                raise InvalidStructure("Invalid ObjStm header")
            offsets.append(byte_offset)

        obj_parser = Parser(decoded)
        obj_parser.seek(first + offsets[index])
        obj = obj_parser.parse_object()
        if obj is None:
            raise InvalidStructure(
                f"Failed to parse object at index {index} in ObjStm {stream_num}"
            )
        return obj

    def get_object(self, obj):
        """Resolve if a reference, else pass through (document.rs:614-619)."""
        if isinstance(obj, Ref):
            return self.resolve(obj)
        return obj

    def object_count(self) -> int:
        return len(self.xref)

    # -- page tree --------------------------------------------------------

    def catalog(self):
        root = self.trailer.get("Root")
        if root is None:
            raise InvalidStructure("Missing Root in trailer")
        root_ref = as_ref(root)
        if root_ref is None:
            raise InvalidStructure("Root must be reference")
        return self.resolve(root_ref)

    def _all_pages(self) -> list:
        # cached: each per-page call in the reference re-walks the tree
        # (document.rs:659-675); the result is identical, so memoize
        if self._pages is not None:
            return self._pages
        catalog = self.catalog()
        d = as_dict(catalog)
        pages_ref = as_ref(d.get("Pages")) if d else None
        if pages_ref is None:
            raise InvalidStructure("Missing Pages in catalog")
        pages: list = []
        self._collect_pages(pages_ref, pages)
        self._pages = pages
        return pages

    def _collect_pages(self, node_ref: Ref, pages: list) -> None:
        """DFS over Kids; a leaf is Type/Page; unknown types count as a
        page when they carry Contents or MediaBox (document.rs:678-717).

        Iterative with an explicit stack and an ANCESTOR-PATH guard:
        the reference recurses with no cycle protection, so a /Kids
        entry pointing back at an ancestor overflows its thread stack
        (verified: CLI aborts, exit 134).  A web-scale engine cannot
        abort on hostile bytes, so a kid already on the current DFS
        path is skipped — acyclic trees (including DAGs that share a
        leaf under two parents, which the reference visits TWICE and
        so do we) traverse in exactly the reference's order at any
        depth the Rust stack survives, while cycles terminate with the
        reachable pages."""
        stack: list[tuple[bool, Ref]] = [(False, node_ref)]
        path: set[Ref] = set()
        while stack:
            leaving, ref = stack.pop()
            if leaving:
                path.discard(ref)
                continue
            if ref in path:  # back-edge: the reference would abort here
                continue
            node = self.resolve(ref)
            d = as_dict(node)
            if d is None:
                raise InvalidStructure("Expected dict in page tree")
            type_name = as_name(d.get("Type")) or ""
            if type_name == "Page":
                pages.append(node)
            elif type_name == "Pages":
                kids = as_array(d.get("Kids"))
                if kids is None:
                    raise InvalidStructure("Pages node missing Kids")
                path.add(ref)
                stack.append((True, ref))
                for kid in reversed(kids):
                    kid_ref = as_ref(kid)
                    if kid_ref is not None:
                        stack.append((False, kid_ref))
            else:
                if "Contents" in d or "MediaBox" in d:
                    pages.append(node)

    def page_count(self) -> int:
        """Counts collected leaves — deliberately NOT the /Count field
        (document.rs:634-646)."""
        return len(self._all_pages())

    def get_page(self, index: int):
        pages = self._all_pages()
        # negative indexes must error like any out-of-range index (the
        # reference's usize cannot even express them) — Python's
        # negative list indexing would silently return a page from the
        # END of the document
        if index < 0 or index >= len(pages):
            raise InvalidStructure(f"Page {index} not found")
        return pages[index]

    # -- streams / contents -------------------------------------------------

    def get_stream_data(self, ref: Ref) -> bytes:
        obj = self.resolve(ref)
        if not isinstance(obj, Stream):
            raise InvalidStructure("Expected stream object")
        return decode_stream(obj.dict, obj.data, extended=self.extended_filters)

    def get_page_contents(self, page) -> bytes:
        d = as_dict(page)
        contents = d.get("Contents") if d else None
        if contents is None:
            raise InvalidStructure("Page has no Contents")
        if isinstance(contents, Ref):
            return self.get_stream_data(contents)
        if isinstance(contents, list):
            # multiple streams concatenated with '\n' after each
            # (document.rs:728-739) — the join byte affects tokenization
            out = bytearray()
            for item in contents:
                r = as_ref(item)
                if r is not None:
                    out.extend(self.get_stream_data(r))
                    out.append(0x0A)
            return bytes(out)
        raise InvalidStructure("Invalid Contents type")

    # -- text extraction -----------------------------------------------------

    def extract_page_text(self, page_index: int) -> list[TextSpan]:
        page = self.get_page(page_index)
        content = self.get_page_contents(page)
        font_encodings = self.load_font_encodings(page)
        return ContentParser(content, font_encodings).parse()

    def load_font_encodings(self, page) -> dict[str, FontEncoding]:
        encodings: dict[str, FontEncoding] = {}
        d = as_dict(page)
        res = d.get("Resources") if d else None
        if res is None:
            return encodings
        resources = self.get_object(res)
        rd = as_dict(resources)
        fonts = rd.get("Font") if rd else None
        if fonts is None:
            return encodings
        font_dict = as_dict(self.get_object(fonts))
        if font_dict is None:
            return encodings
        for font_name, font_ref in font_dict.items():
            try:
                encodings[font_name] = self._load_single_font_encoding(font_ref)
            except PdfError:
                # fonts that fail to load are silently skipped
                # (document.rs:775-777) → content falls back to
                # decode_default for that font
                pass
        return encodings

    def _load_single_font_encoding(self, font_ref) -> FontEncoding:
        # per-document memo keyed on the font REFERENCE: multi-page
        # documents share font objects across pages, and the encoding
        # build (ToUnicode CMap parse in particular) is deterministic
        # in the font object, so page 2+ reuses page 1's result.
        # Direct (non-Ref) font dicts skip the memo.
        key = font_ref if isinstance(font_ref, Ref) else None
        if key is not None:
            cached = self._font_encs.get(key)
            if cached is not None:
                return cached
        enc = self._load_single_font_encoding_uncached(font_ref)
        if key is not None:
            self._font_encs[key] = enc
        return enc

    def _load_single_font_encoding_uncached(self, font_ref) -> FontEncoding:
        font = self.get_object(font_ref)
        font_dict = as_dict(font)
        if font_dict is None:
            raise InvalidStructure("Font is not a dictionary")

        # ToUnicode CMap wins when present and loadable (document.rs:791-800)
        tounicode = font_dict.get("ToUnicode")
        if tounicode is not None:
            r = as_ref(tounicode)
            if r is not None:
                try:
                    cmap_data = self.get_stream_data(r)
                    return FontEncoding.from_cid_map(parse_tounicode_cmap(cmap_data))
                except PdfError:
                    pass

        encoding = font_dict.get("Encoding")
        if isinstance(encoding, Name):
            if str(encoding) == "MacRomanEncoding":
                return FontEncoding.mac_roman()
            return FontEncoding.win_ansi()
        if isinstance(encoding, dict):
            # Differences arrays are an acknowledged reference TODO
            # (document.rs:825) — base encoding only, like the reference
            base = as_name(encoding.get("BaseEncoding"))
            if base == "MacRomanEncoding":
                return FontEncoding.mac_roman()
            return FontEncoding.win_ansi()
        return FontEncoding.win_ansi()

    def extract_page_text_string(self, page_index: int) -> str:
        """Simple line-grouped text with FIXED tolerance 3.0 — a
        distinct rule from the layout path (document.rs:837-885)."""
        return simple_text_from_spans(self.extract_page_text(page_index))


def simple_text_from_spans(spans: list[TextSpan]) -> str:
    """The E6 grouping over an existing span list (document.rs:842-884)
    — does not mutate its input, so span lists can be shared across
    renderers (api.extract_all_formats)."""
    spans = sorted(spans, key=lambda s: (-s.y, s.x))

    lines: list[list[TextSpan]] = []
    current: list[TextSpan] = []
    current_y: float | None = None
    tolerance = 3.0
    for span in spans:
        if current_y is not None and abs(span.y - current_y) <= tolerance:
            current.append(span)
        else:
            if current:
                lines.append(current)
            current_y = span.y
            current = [span]
    if current:
        lines.append(current)

    return "\n".join(" ".join(s.text for s in line) for line in lines)


# -- module-level structure parsing -------------------------------------------


def find_startxref(data: bytes) -> int:
    """Back-scan the last 1 KB (document.rs:58-69).  The reference's
    loop bound excludes a marker flush at EOF; rfind's end bound
    reproduces that."""
    n = len(data)
    # reference scans i in [n-1024, n-9) so the marker never abuts EOF;
    # rfind end bound n-1 reproduces the same max start position n-10
    idx = data.rfind(b"startxref", max(n - 1024, 0), max(n - 1, 0))
    if idx == -1:
        raise MissingEof("missing startxref")
    return idx


def parse_startxref(data: bytes, pos: int) -> int:
    parser = Parser(data)
    parser.seek(pos + len(b"startxref"))
    obj = parser.parse_object()
    if isinstance(obj, int) and not isinstance(obj, bool):
        # a negative offset cannot exist for the reference (usize) and
        # must not reach Python's negative slicing/indexing, where it
        # would silently parse from the END of the buffer
        if obj < 0:
            raise InvalidStructure("Invalid startxref offset")
        return obj
    raise ParseError(pos, "Expected xref offset after startxref")


def parse_xref_and_trailer(
    data: bytes, offset: int, extended: bool = False
) -> tuple[dict, dict]:
    """Follow the Prev chain; the first (newest) trailer wins
    (document.rs:90-141)."""
    xref: dict[int, XRefEntry] = {}
    current = offset
    final_trailer: dict | None = None
    seen_offsets: set[int] = set()  # cycle guard (the reference would loop)

    while True:
        if current < 0:
            # negative Prev offsets (impossible for the reference's
            # usize) must not hit Python's from-the-end slicing
            raise InvalidStructure("Invalid xref offset")
        if current in seen_offsets:
            break
        seen_offsets.add(current)
        if current < len(data) and data[current:].startswith(b"xref"):
            parse_traditional_xref(data, current, xref)
            trailer = find_and_parse_trailer(data, current)
            if final_trailer is None:
                final_trailer = trailer
            prev = as_int(trailer.get("Prev"))
            if prev is None:
                break
            current = prev
        else:
            stream_trailer, prev = parse_xref_stream(
                data, current, xref, extended=extended
            )
            if final_trailer is None:
                final_trailer = stream_trailer
            if prev is None:
                break
            current = prev

    if final_trailer is None:
        raise InvalidStructure("No valid trailer found")
    return xref, final_trailer


def parse_traditional_xref(data: bytes, offset: int, xref: dict) -> None:
    """Classic table: ``start count`` subsection headers followed by
    fixed-width 20-byte entries; free entries skipped; later (older)
    sections in the Prev chain DO overwrite — matching the reference's
    unconditional insert (document.rs:239-248)."""
    pos = offset + 4  # len("xref")
    n = len(data)
    while pos < n and data[pos] in b" \t\n\r":
        pos += 1

    while True:
        if pos + 7 <= n and data[pos : pos + 7] == b"trailer":
            break
        if pos >= n:
            break

        eol = _find_eol(data, pos)
        try:
            header = data[pos:eol].decode("utf-8")
        except UnicodeDecodeError:
            raise InvalidXref("invalid xref header") from None
        parts = header.split()
        if len(parts) != 2:
            break  # presumably hit the trailer
        try:
            start_obj = int(parts[0])
            count = int(parts[1])
        except ValueError:
            raise InvalidXref("invalid xref subsection header") from None
        # the reference parses u32 (document.rs: parts[i].parse());
        # Python's unbounded int() must reject the same range
        if not (0 <= start_obj <= 0xFFFFFFFF and 0 <= count <= 0xFFFFFFFF):
            raise InvalidXref("invalid xref subsection header")

        pos = _skip_eol(data, eol)
        strict = _XREF_ENTRY_STRICT_RE.match
        for i in range(count):
            # fast path: the spec's fixed-width 20-byte entry (10-digit
            # offset, 5-digit generation, n/f, 2-byte EOL).  Consumes
            # exactly the bytes the general find-EOL path would (the
            # EOL alternation mirrors _find_eol + _skip_eol, longest
            # first); any off-form line falls back per entry.
            m = strict(data, pos)
            if m is not None:
                generation = int(m.group(2))
                if generation <= 0xFFFF:
                    if data[pos + 17] == 0x6E:  # 'n'
                        xref[start_obj + i] = XRefEntry(
                            int(m.group(1)), generation, True, False
                        )
                    pos = m.end()
                    continue
            entry_end = _find_eol(data, pos)
            if entry_end <= pos:
                raise InvalidXref("truncated xref entry")
            line = data[pos:entry_end]
            if len(line) < 18:
                # the reference requires >= 17 then indexes byte 17;
                # 17-byte lines would panic there — treat as invalid
                raise InvalidXref("short xref entry")
            try:
                entry_offset = int(line[0:10].strip())
                generation = int(line[11:16].strip())
            except ValueError:
                raise InvalidXref("bad xref entry fields") from None
            # reference field types: offset usize, generation u16 —
            # a negative offset ('-000000017') or generation 99999
            # fails parse there; unbounded int() must match (and a
            # negative offset would otherwise index from the END of
            # the buffer in resolve())
            if entry_offset < 0 or not (0 <= generation <= 0xFFFF):
                raise InvalidXref("bad xref entry fields")
            in_use = line[17] == 0x6E  # 'n'
            if in_use:
                xref[start_obj + i] = XRefEntry(entry_offset, generation, True, False)
            pos = _skip_eol(data, entry_end)


def _find_eol(data: bytes, pos: int) -> int:
    n = len(data)
    i = pos
    while i < n and data[i] not in (0x0A, 0x0D):
        i += 1
    return i


def _skip_eol(data: bytes, pos: int) -> int:
    n = len(data)
    if pos < n and data[pos] == 0x0D:
        pos += 1
    if pos < n and data[pos] == 0x0A:
        pos += 1
    return pos


def find_and_parse_trailer(data: bytes, xref_offset: int) -> dict:
    idx = data.find(b"trailer", xref_offset)
    # reference bound: a trailer keyword ending at EOF is not accepted
    # (document.rs:274-283)
    if idx == -1 or idx + 7 >= len(data):
        raise InvalidStructure("Missing trailer")
    parser = Parser(data)
    parser.seek(idx + 7)
    obj = parser.parse_object()
    if isinstance(obj, dict):
        return obj
    raise InvalidStructure("Trailer must be dictionary")


def parse_xref_stream(
    data: bytes, offset: int, xref: dict, extended: bool = False
) -> tuple[dict, int | None]:
    """PDF 1.5+ xref stream (document.rs:298-446): /W 3-field
    big-endian rows over /Index ranges (default ``[0 Size]``); type 0
    free, 1 offset, 2 compressed-in-ObjStm; existing (newer) entries
    win; the stream dict doubles as the trailer."""
    parser = Parser(data)
    parser.seek(offset)

    obj_num = parser.parse_object()
    if not isinstance(obj_num, int) or isinstance(obj_num, bool):
        raise InvalidStructure("Expected object number at XRef stream offset")
    gen_num = parser.parse_object()
    if not isinstance(gen_num, int) or isinstance(gen_num, bool):
        raise InvalidStructure("Expected generation number at XRef stream")
    stream_obj = parser.parse_object()
    if stream_obj is None:
        raise InvalidStructure("Failed to parse XRef stream object")
    if not isinstance(stream_obj, Stream):
        raise InvalidStructure("XRef stream offset does not point to a stream object")

    d = stream_obj.dict
    decoded = decode_stream(d, stream_obj.data, extended=extended)

    w = as_array(d.get("W"))
    if w is None:
        raise InvalidStructure("XRef stream missing /W array")
    if len(w) != 3:
        raise InvalidStructure("XRef stream /W must have 3 entries")
    w1 = as_int(w[0]) or 0
    w2 = as_int(w[1]) or 0
    w3 = as_int(w[2]) or 0
    entry_size = w1 + w2 + w3
    if entry_size == 0:
        raise InvalidStructure("XRef stream entry size is 0")

    size = as_int(d.get("Size")) or 0
    index_arr = as_array(d.get("Index"))
    if index_arr is not None:
        index_pairs = []
        for j in range(0, len(index_arr), 2):
            start = as_int(index_arr[j]) or 0
            cnt = as_int(index_arr[j + 1]) if j + 1 < len(index_arr) else 0
            index_pairs.append((start, cnt or 0))
    else:
        index_pairs = [(0, size)]

    pos = 0
    for start_obj, count in index_pairs:
        for i in range(count):
            if pos + entry_size > len(decoded):
                break
            f1 = _read_field(decoded, pos, w1, 1)  # type defaults to 1
            f2 = _read_field(decoded, pos + w1, w2, 0)
            f3 = _read_field(decoded, pos + w1 + w2, w3, 0)
            pos += entry_size
            num = start_obj + i
            if num in xref:
                continue  # most recent xref in the chain takes priority
            if f1 == 1:
                xref[num] = XRefEntry(f2, f3, True, False)
            elif f1 == 2:
                xref[num] = XRefEntry(f2, f3, True, True)
            # type 0 (free) and unknown types are skipped

    trailer = dict(d)
    prev = as_int(trailer.get("Prev"))
    return trailer, prev


def _read_field(data: bytes, pos: int, width: int, default: int) -> int:
    if width == 0:
        return default
    return int.from_bytes(data[pos : pos + width], "big")
