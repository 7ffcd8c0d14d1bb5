"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed via ``mapInPandas``.

Image METADATA (format, dimensions, frame count) is parsed for real
from container headers — PNG/JPEG/GIF/WebP via stdlib ``struct``
(ops/imagemeta.py); no codecs needed.  Only pixel decoding remains a
clearly-marked deterministic STUB (md5-derived pseudo-metadata for
unrecognized payloads) because the container has no PIL/ffmpeg.  The
Spark-side plumbing is exactly what a production decode needs:
Arrow-batched ``mapInPandas`` over a binary column, small batch sizes
for MB-scale payloads, schema'd struct output, and errors as values.
Swap :func:`_decode_stub` for PIL/ffmpeg on a real cluster and
nothing else changes.

Because the driver's stand-in payloads (document text) never hit the
real-image path (see :func:`_decode`), the stub is pure md5
arithmetic with an exact SQL twin — so the multimodal path keeps a
full value-level oracle check, not just a rows-only check.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pdf_parser_spark.ops.common import load_table

MM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("decode_error", StringType()),
    ]
)

_FORMATS = ["png", "jpeg", "webp"]


def _h32_py(s: bytes) -> int:
    return int(hashlib.md5(s).hexdigest()[:8], 16)


def _decode_stub(payload: bytes) -> tuple[str, int, int, int]:
    """Fallback for UNRECOGNIZED payloads only (real pixel decode needs
    codec libraries this container lacks).  Deterministic md5-derived
    metadata; a real deployment replaces ONLY this function:

        img = PIL.Image.open(io.BytesIO(payload))       # real decode
        return img.format.lower(), img.width, img.height, 1
    """
    h = _h32_py(payload)
    fmt = _FORMATS[h % 3]
    width = 16 + (_h32_py(b"w|" + payload) % 240)
    height = 16 + (_h32_py(b"h|" + payload) % 240)
    n_frames = 1 + (_h32_py(b"f|" + payload) % 4)
    return fmt, width, height, n_frames


def _decode(payload: bytes) -> tuple[str, int, int, int]:
    """Image metadata: REAL header parse first (PNG IHDR / JPEG SOFn /
    GIF screen descriptor / WebP VP8·VP8L·VP8X — stdlib ``struct``
    over public format specs, ops/imagemeta.py), md5 stub only for
    formats the header parser does not recognize.

    Oracle note: the driver's stand-in payloads are UTF-8 document
    text, where the PNG/JPEG magics are unreachable by construction
    (0x89/0xFF are never the first byte of UTF-8 text) and the
    GIF/RIFF ASCII magics never occur in the synthetic corpus
    (asserted by tests/test_multimodal_imagemeta.py), so the SQL twin
    remains the stub arithmetic."""
    from pdf_parser_spark.ops.imagemeta import parse_image_header

    real = parse_image_header(payload)
    if real is not None:
        return real
    return _decode_stub(payload)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract over a binary column with mapInPandas.

    The ``documents.text`` bytes stand in for image payloads (the
    testdata has no true binary media column).  Scale: narrow map,
    Arrow batches bounded by ``maxRecordsPerBatch`` so MB-scale blobs
    can't blow the Python worker; decode failures become rows, never
    task deaths.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                try:
                    fmt, w, h, nf = _decode(payload)
                    rows.append((doc_id, len(payload), fmt, w, h, nf, None))
                except Exception as e:  # noqa: BLE001 — row-level error
                    rows.append((doc_id, len(payload), None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "byte_len", "format", "width", "height",
                    "n_frames", "decode_error",
                ],
            )

    return docs.mapInPandas(extract, MM_SCHEMA)


# exact SQL twin of the md5-derived stub (text is ASCII in the
# synthetic corpus, so utf-8 length == char length)
_H = "(('0x' || substr(md5({e}), 1, 8))::BIGINT)"
MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id,
       length(text)::BIGINT AS byte_len,
       (['png', 'jpeg', 'webp'])[({_H.format(e="text")} % 3) + 1] AS format,
       (16 + ({_H.format(e="concat('w|', text)")} % 240))::INTEGER AS width,
       (16 + ({_H.format(e="concat('h|', text)")} % 240))::INTEGER AS height,
       (1 + ({_H.format(e="concat('f|', text)")} % 4))::INTEGER AS n_frames,
       NULL::VARCHAR AS decode_error
FROM documents
"""

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_h32", LongType()),
    ]
)

FRAME_STRIDE = 2
FRAME_FPS_MS = 40  # 25 fps
MAX_SAMPLED_FRAMES = 64  # fan-out cap for real (mvhd-timed) containers


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-style payloads: each payload
    fans out to every {FRAME_STRIDE}nd frame (count from the decode
    stub), one row per sampled frame with its timestamp and a
    frame-level content hash.

    Scale: a narrow mapInPandas that EMITS more rows than it reads —
    the output/input row ratio is bounded by frames/stride (and the
    MAX_SAMPLED_FRAMES cap for real containers), so Arrow batch memory
    stays bounded; no shuffle at all.  A real deployment swaps the
    stub for ffmpeg keyframe extraction and the emitted hash for a
    frame embedding; the fan-out shape is unchanged.

    When the payload IS a real container (MP4 ftyp box), the frame
    count and timestamps derive from the real mvhd timeline
    (ops/containermeta.py) instead of the stub — unreachable for the
    driver's text payloads (binary box framing cannot occur in UTF-8
    text; asserted by tests), so the SQL twin stays the stub
    arithmetic.
    """
    from pdf_parser_spark.ops.containermeta import parse_container_header

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                meta = parse_container_header(payload)
                if meta is not None and meta["kind"] == "mp4":
                    # real container timeline: one frame per FRAME_FPS_MS
                    # tick, capped so fan-out stays bounded
                    n_frames = min(
                        max(1, meta["duration_ms"] // FRAME_FPS_MS),
                        MAX_SAMPLED_FRAMES * FRAME_STRIDE,
                    )
                else:
                    _fmt, _w, _h, n_frames = _decode(payload)
                for idx in range(0, n_frames, FRAME_STRIDE):
                    rows.append(
                        (
                            doc_id,
                            idx,
                            idx * FRAME_FPS_MS,
                            _h32_py(payload + b"|" + str(idx).encode()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "ts_ms", "frame_h32"]
            )

    return docs.mapInPandas(sample, FRAME_SCHEMA)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH meta AS (
  SELECT doc_id, text,
         (1 + ({_H.format(e="concat('f|', text)")} % 4)) AS n_frames
  FROM documents
),
frames AS (
  SELECT doc_id, text,
         unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
  FROM meta
)
SELECT doc_id,
       frame_idx::INTEGER AS frame_idx,
       (frame_idx * {FRAME_FPS_MS})::BIGINT AS ts_ms,
       {_H.format(e="concat(text, '|', frame_idx::VARCHAR)")} AS frame_h32
FROM frames
"""


RESIZE_BOX = 64


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: aspect-preserving fit of each payload's
    (stub-decoded) dimensions into a {RESIZE_BOX}px box, all-integer
    arithmetic (floor((dim * box) / max_dim), floored at 1 px) so the
    plan is bit-identical on every engine.

    Scale: same narrow mapInPandas shape as the decode; the real
    pixel resample (PIL ``Image.resize``) replaces only the body —
    the dimension contract emitted here is what a production job
    records next to the resized blob for audit.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                _fmt, w, h, _nf = _decode(payload)
                m = max(w, h)
                tw = max(1, (w * RESIZE_BOX) // m)
                th = max(1, (h * RESIZE_BOX) // m)
                rows.append((doc_id, w, h, tw, th))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "target_w", "target_h"],
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("target_w", IntegerType()),
            StructField("target_h", IntegerType()),
        ]
    )
    return docs.mapInPandas(plan, schema)


MULTIMODAL_RESIZE_SQL = f"""
WITH meta AS (
  SELECT doc_id,
         (16 + ({_H.format(e="concat('w|', text)")} % 240)) AS w,
         (16 + ({_H.format(e="concat('h|', text)")} % 240)) AS h
  FROM documents
)
SELECT doc_id,
       w::INTEGER AS width,
       h::INTEGER AS height,
       greatest(1, (w * {RESIZE_BOX}) // greatest(w, h))::INTEGER AS target_w,
       greatest(1, (h * {RESIZE_BOX}) // greatest(w, h))::INTEGER AS target_h
FROM meta
"""


QUERIES = {
    "multimodal_features": (multimodal_features, MULTIMODAL_FEATURES_SQL),
    "multimodal_frame_sample": (
        multimodal_frame_sample,
        MULTIMODAL_FRAME_SAMPLE_SQL,
    ),
    "multimodal_resize": (multimodal_resize, MULTIMODAL_RESIZE_SQL),
}
