"""Audio/video container metadata op (``multimodal_container_meta``).

Same contract as ``pdf_image_stats``: the testdata has no binary media
column, so each ``documents`` row deterministically synthesizes a REAL
container — an MP4 (ftyp + moov/mvhd/tkhd), a WAV (RIFF fmt+data),
an MP3 (CBR MPEG-1 Layer III frame chain), or a FLAC (STREAMINFO)
— with parameters derived from md5 arithmetic over the text.  The
Spark side parses the container back with the struct-level header
walker (ops/containermeta.py), and the DuckDB twin recomputes the
expected metadata analytically (including the mvhd timescale
round-trip: ms → 600-unit ticks → ms, both truncating divisions), so
the oracle certifies the build → parse round-trip value-for-value.

Scale: one narrow ``mapInPandas``; fixed-width metadata rows out,
no shuffle.  On a real corpus the synthesize step disappears and the
parser runs over the pages table's binary column directly.
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
from pdf_parser_spark.ops.containermeta import (
    build_flac,
    build_mp3,
    build_mp4,
    build_wav,
    parse_container_header,
)

MP4_TIMESCALE = 600
WAV_RATES = [8000, 16000, 22050, 44100]
MP3_BITRATES = [128, 192, 256, 320]
MP3_RATES = [44100, 48000, 32000]
FLAC_RATES = [44100, 48000, 96000]


def _h32(s: bytes) -> int:
    return int(hashlib.md5(s).hexdigest()[:8], 16)


def _doc_container(payload: bytes) -> bytes:
    """Deterministic real container for a document's payload."""
    kind = _h32(b"ck|" + payload) % 4
    if kind == 0:
        dur_ms = 1000 + _h32(b"vd|" + payload) % 600_000
        w = 160 + _h32(b"vw|" + payload) % 1760
        h = 90 + _h32(b"vh|" + payload) % 990
        return build_mp4(dur_ms, w, h, timescale=MP4_TIMESCALE)
    if kind == 1:
        sr = WAV_RATES[_h32(b"sr|" + payload) % 4]
        ch = 1 + _h32(b"ch|" + payload) % 2
        n_samples = 1000 + _h32(b"ns|" + payload) % 1_000_000
        return build_wav(sr, ch, 16, n_samples)
    if kind == 2:
        br = MP3_BITRATES[_h32(b"br|" + payload) % 4]
        sr = MP3_RATES[_h32(b"ms|" + payload) % 3]
        ch = 1 + _h32(b"mc|" + payload) % 2
        n_frames = 1 + _h32(b"nf|" + payload) % 20
        return build_mp3(br, sr, ch, n_frames)
    sr = FLAC_RATES[_h32(b"fs|" + payload) % 3]
    ch = 1 + _h32(b"fc|" + payload) % 2
    total = 1000 + _h32(b"ft|" + payload) % 10_000_000
    return build_flac(sr, ch, 16, total)


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("duration_ms", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def multimodal_container_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                m = parse_container_header(_doc_container(payload))
                if m is None:  # visible mismatch, never a task death
                    rows.append((doc_id, None, None, None, None, None, None))
                    continue
                rows.append(
                    (
                        doc_id,
                        m["kind"],
                        m["duration_ms"],
                        m.get("width"),
                        m.get("height"),
                        m.get("sample_rate"),
                        m.get("channels"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "kind", "duration_ms", "width", "height",
                    "sample_rate", "channels",
                ],
            )

    return docs.mapInPandas(meta, _META_SCHEMA)


_H = "(('0x' || substr(md5({e}), 1, 8))::BIGINT)"

MULTIMODAL_CONTAINER_META_SQL = f"""
WITH params AS (
  SELECT doc_id,
         ({_H.format(e="concat('ck|', text)")} % 4) AS k,
         (1000 + ({_H.format(e="concat('vd|', text)")} % 600000)) AS dur_ms,
         (160 + ({_H.format(e="concat('vw|', text)")} % 1760)) AS vw,
         (90 + ({_H.format(e="concat('vh|', text)")} % 990)) AS vh,
         ([8000, 16000, 22050, 44100])[
             ({_H.format(e="concat('sr|', text)")} % 4) + 1] AS sr,
         (1 + ({_H.format(e="concat('ch|', text)")} % 2)) AS ch,
         (1000 + ({_H.format(e="concat('ns|', text)")} % 1000000)) AS ns,
         ([44100, 48000, 32000])[
             ({_H.format(e="concat('ms|', text)")} % 3) + 1] AS m_sr,
         (1 + ({_H.format(e="concat('mc|', text)")} % 2)) AS m_ch,
         (1 + ({_H.format(e="concat('nf|', text)")} % 20)) AS m_frames,
         ([44100, 48000, 96000])[
             ({_H.format(e="concat('fs|', text)")} % 3) + 1] AS f_sr,
         (1 + ({_H.format(e="concat('fc|', text)")} % 2)) AS f_ch,
         (1000 + ({_H.format(e="concat('ft|', text)")} % 10000000)) AS f_total
  FROM documents
)
SELECT doc_id,
       CASE k WHEN 0 THEN 'mp4' WHEN 1 THEN 'wav'
              WHEN 2 THEN 'mp3' ELSE 'flac' END AS kind,
       CAST(CASE k
            -- mvhd timescale round-trip: ms -> ticks -> ms (truncating)
            WHEN 0 THEN ((dur_ms * {MP4_TIMESCALE}) // 1000)
                        * 1000 // {MP4_TIMESCALE}
            WHEN 1 THEN (ns * 1000) // sr
            WHEN 2 THEN (m_frames * 1152 * 1000) // m_sr
            ELSE (f_total * 1000) // f_sr END AS BIGINT) AS duration_ms,
       CAST(CASE k WHEN 0 THEN vw END AS INTEGER) AS width,
       CAST(CASE k WHEN 0 THEN vh END AS INTEGER) AS height,
       CAST(CASE k WHEN 1 THEN sr WHEN 2 THEN m_sr
                   WHEN 3 THEN f_sr END AS INTEGER) AS sample_rate,
       CAST(CASE k WHEN 1 THEN ch WHEN 2 THEN m_ch
                   WHEN 3 THEN f_ch END AS INTEGER) AS channels
FROM params
"""

QUERIES = {
    "multimodal_container_meta": (
        multimodal_container_meta,
        MULTIMODAL_CONTAINER_META_SQL,
    ),
}
