"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed via ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (md5-derived pseudo-metadata) — but
the Spark-side plumbing is real and exactly what a production decode
needs: Arrow-batched ``mapInPandas`` over a binary column, small
batch sizes for MB-scale payloads, schema'd struct output, and errors
as values.  Swap :func:`_decode_stub` for PIL/ffmpeg on a real
cluster and nothing else changes.

Because the stub is pure md5 arithmetic, it ALSO has an exact SQL
twin — so even the multimodal path gets a full value-level oracle
check, not just a rows-only check.
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
    """STUB for the real image/video decode (PIL / ffmpeg not in this
    container).  Deterministic md5-derived metadata; a real deployment
    replaces ONLY this function:

        img = PIL.Image.open(io.BytesIO(payload))       # real decode
        return img.format.lower(), img.width, img.height, 1
    """
    h = _h32_py(payload)
    fmt = _FORMATS[h % 3]
    width = 16 + (_h32_py(b"w|" + payload) % 240)
    height = 16 + (_h32_py(b"h|" + payload) % 240)
    n_frames = 1 + (_h32_py(b"f|" + payload) % 4)
    return fmt, width, height, n_frames


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
                    fmt, w, h, nf = _decode_stub(payload)
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

QUERIES = {
    "multimodal_features": (multimodal_features, MULTIMODAL_FEATURES_SQL),
}
