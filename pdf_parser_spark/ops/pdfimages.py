"""Embedded-image inventory for PDF documents (``pdf_image_stats``).

Multimodal corpus building needs to know what images a PDF carries
WITHOUT decoding pixels: per document, how many image XObjects, which
are DCT (JPEG) streams, and their dimensions.  All of that is header
data — the XObject dict carries /Width /Height (ISO 32000 §8.9.5),
and for /DCTDecode streams the raw stream bytes ARE a JPEG whose SOFn
marker segment carries the true dimensions (ITU-T T.81 §B.2.2),
walkable with the existing header parser (ops/imagemeta.py) — no
codec needed.  The reference has no image path at all (DCTDecode is
an UnsupportedFilter there, decode/mod.rs:45-51); this op makes the
streams it skips useful.

Corpus wiring for the oracle gate: the testdata has no PDF column, so
each ``documents`` row deterministically synthesizes a real PDF
(fixtures.gen.PdfBuilder — classic xref, page tree, /XObject
resources) embedding 1-3 images whose format/dimensions derive from
md5 arithmetic over the text.  The Spark side then runs the REAL
inventory — xref walk, object resolution, XObject discovery, SOFn
parse — and the DuckDB twin recomputes the expected answer
analytically, so a value-exact oracle certifies the whole build →
parse → walk round-trip (``dims_verified`` pins that the SOFn dims
always match the dict dims).

Scale: one narrow ``mapInPandas`` pass, no shuffle; per-document work
is bounded by the XObject count, and only fixed-width stat rows leave
the worker.  On a real corpus, swap :func:`_doc_pdf` for the pages
table's ``html`` column — the inventory function is payload-agnostic.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from pdf_parser_spark.engine.document import Document
from pdf_parser_spark.engine.errors import PdfError
from pdf_parser_spark.engine.objects import Name, Ref, Stream, as_dict, as_int
from pdf_parser_spark.ops.common import load_table
from pdf_parser_spark.ops.imagemeta import parse_image_header

N_IMG_MAX = 3
DIM_MIN, DIM_MOD = 16, 2000


def _h32(s: bytes) -> int:
    return int(hashlib.md5(s).hexdigest()[:8], 16)


# -- real inventory (payload-agnostic) ---------------------------------------

def pdf_image_inventory(data: bytes) -> list[dict]:
    """Walk every page's /Resources /XObject dict and inventory image
    streams: ``{filter, width, height, parsed_w, parsed_h, verified}``.
    Dict dims come from /Width /Height; for /DCTDecode streams the raw
    bytes are additionally SOFn-walked and ``verified`` pins agreement.
    Raises PdfError on unparseable documents (callers map to rows)."""
    doc = Document.parse(data)
    out: list[dict] = []
    for i in range(doc.page_count()):
        page = as_dict(doc.get_page(i)) or {}
        res = page.get("Resources")
        if isinstance(res, Ref):
            res = doc.resolve(res)
        res = as_dict(res) or {}
        xobjs = res.get("XObject")
        if isinstance(xobjs, Ref):
            xobjs = doc.resolve(xobjs)
        xobjs = as_dict(xobjs) or {}
        for _name, ref in sorted(xobjs.items()):
            obj = doc.resolve(ref) if isinstance(ref, Ref) else ref
            if not isinstance(obj, Stream):
                continue
            d = obj.dict
            if d.get("Subtype") != Name("Image"):
                continue
            filt = d.get("Filter")
            if isinstance(filt, list):
                filt = filt[0] if filt else None
            filt = str(filt) if filt is not None else None
            w, h = as_int(d.get("Width")), as_int(d.get("Height"))
            parsed_w = parsed_h = None
            verified = w is not None and h is not None and w > 0 and h > 0
            if filt == "DCTDecode":
                parsed = parse_image_header(obj.data)
                if parsed is not None and parsed[0] == "jpeg":
                    parsed_w, parsed_h = parsed[1], parsed[2]
                verified = verified and parsed_w == w and parsed_h == h
            out.append(
                {"filter": filt, "width": w, "height": h,
                 "parsed_w": parsed_w, "parsed_h": parsed_h,
                 "verified": verified}
            )
    return out


# -- deterministic synthetic PDFs with embedded images ------------------------

def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal JPEG: SOI + SOF0 (baseline, 3 components) + EOI.  The
    SOFn walker needs only the marker stream, not entropy data."""
    sof = struct.pack(
        ">BBHBHHB", 0xFF, 0xC0, 17, 8, h, w, 3
    ) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    return b"\xff\xd8" + sof + b"\xff\xd9"


def _doc_params(payload: bytes) -> list[tuple[bool, int, int]]:
    """[(is_dct, w, h)] for each of the doc's 1..N_IMG_MAX images —
    md5 arithmetic mirrored exactly by the oracle SQL."""
    n = 1 + _h32(b"ni|" + payload) % N_IMG_MAX
    out = []
    for j in range(1, n + 1):
        out.append(
            (
                _h32(f"dct|{j}|".encode() + payload) % 2 == 1,
                DIM_MIN + _h32(f"iw|{j}|".encode() + payload) % DIM_MOD,
                DIM_MIN + _h32(f"ih|{j}|".encode() + payload) % DIM_MOD,
            )
        )
    return out


def _doc_pdf(payload: bytes) -> bytes:
    """A real one-page PDF embedding the doc's parameterized images as
    XObjects: DCT images carry true JPEG bytes, raster images a
    Flate-compressed row (dims live in the dict, as in real PDFs)."""
    import zlib

    from fixtures.gen import PdfBuilder

    imgs = _doc_params(payload)
    b = PdfBuilder()
    b.add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    b.add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    names = b" ".join(
        b"/Im%d %d 0 R" % (j + 1, 6 + j) for j in range(len(imgs))
    )
    b.add(
        3,
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> "
        b"/XObject << " + names + b" >> >> >>",
    )
    draw = b" ".join(
        b"q %d 0 0 %d 0 0 cm /Im%d Do Q" % (w, h, j + 1)
        for j, (_d, w, h) in enumerate(imgs)
    )
    b.add_stream(4, b"", b"BT /F1 12 Tf 72 720 Td (img doc) Tj ET " + draw)
    b.add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for j, (is_dct, w, h) in enumerate(imgs):
        head = (
            b"/Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8" % (w, h)
        )
        if is_dct:
            b.add_stream(6 + j, head, _jpeg_bytes(w, h), b"/DCTDecode")
        else:
            b.add_stream(
                6 + j, head, zlib.compress(b"\x00" * 16), b"/FlateDecode"
            )
    return b.build()


_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_images", IntegerType()),
        StructField("n_dct", IntegerType()),
        StructField("max_width", IntegerType()),
        StructField("max_height", IntegerType()),
        StructField("total_pixels", LongType()),
        StructField("dims_verified", BooleanType()),
    ]
)


def pdf_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document embedded-image stats over the synthesized PDF
    corpus: the real build → xref walk → XObject inventory → SOFn
    parse round-trip, value-pinned by the analytic oracle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                try:
                    inv = pdf_image_inventory(_doc_pdf(payload))
                except PdfError:
                    rows.append((doc_id, -1, -1, -1, -1, -1, False))
                    continue
                rows.append(
                    (
                        doc_id,
                        len(inv),
                        sum(1 for r in inv if r["filter"] == "DCTDecode"),
                        max(r["width"] for r in inv),
                        max(r["height"] for r in inv),
                        sum(r["width"] * r["height"] for r in inv),
                        all(r["verified"] for r in inv),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_images", "n_dct", "max_width",
                    "max_height", "total_pixels", "dims_verified",
                ],
            )

    return docs.mapInPandas(stats, _STATS_SCHEMA)


_H = "(('0x' || substr(md5({e}), 1, 8))::BIGINT)"

PDF_IMAGE_STATS_SQL = f"""
WITH meta AS (
  SELECT doc_id, text,
         (1 + ({_H.format(e="concat('ni|', text)")} % {N_IMG_MAX})) AS n_images
  FROM documents
),
imgs AS (
  SELECT doc_id,
         ({_H.format(e="concat('dct|', j::VARCHAR, '|', text)")} % 2) AS is_dct,
         ({DIM_MIN} + ({_H.format(e="concat('iw|', j::VARCHAR, '|', text)")}
            % {DIM_MOD})) AS w,
         ({DIM_MIN} + ({_H.format(e="concat('ih|', j::VARCHAR, '|', text)")}
            % {DIM_MOD})) AS h
  FROM meta
  CROSS JOIN (SELECT unnest(generate_series(1, {N_IMG_MAX})) AS j)
  WHERE j <= n_images
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_images,
       CAST(sum(is_dct) AS INTEGER) AS n_dct,
       CAST(max(w) AS INTEGER) AS max_width,
       CAST(max(h) AS INTEGER) AS max_height,
       CAST(sum(w * h) AS BIGINT) AS total_pixels,
       bool_and(TRUE) AS dims_verified
FROM imgs
GROUP BY doc_id
"""

QUERIES = {
    "pdf_image_stats": (pdf_image_stats, PDF_IMAGE_STATS_SQL),
}
