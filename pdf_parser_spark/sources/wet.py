"""WET sink: export extracted text as Common-Crawl WET archives.

Common Crawl ships extraction output as WET files — WARC archives of
``conversion`` records whose body is the extracted plain text (ISO
28500 §6.8; the WET convention is public CC practice).  This sink
closes the crawl loop for this engine: ``read_warc_pages`` ingests the
raw crawl, the extraction job produces text, and ``write_wet_files``
emits the text in the format every CC consumer already reads —
including our own reader, which round-trips WET conversion records
back into pages rows (``text`` populated, ``html`` NULL).

Spark shape: a file-format sink cannot be expressed as a DataFrame
write (Spark has no raw-byte concatenation sink, and the text sink's
row separator would corrupt Content-Length framing), so this is the
one legitimately imperative per-partition path: ``mapInPandas``
(Arrow batches, no pickled rows) streams each partition's records
into ONE ``part-NNNNN.warc.wet.gz`` file — constant memory, one file
per task, no driver collect; only the record FRAMING itself walks
rows, because a WARC member is a per-record byte layout.  At
cluster scale the open() below is the pluggable seam for an HDFS/S3
client; everything else (framing, naming, lineage) is already
partition-local.

Determinism: record ids derive from md5(url, ts) — no uuids, no wall
clock — and each partition is locally sorted by url before writing, so
re-running the export over the same partitioning yields byte-identical
files (the property the snapshot/resume layer relies on elsewhere).

Compression is CC-style one-gzip-member-per-record, which
``_gunzip_members`` in the reader already walks.
"""

from __future__ import annotations

import hashlib
import os
import zlib
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, functions as F

CRLF = b"\r\n"

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def wet_record(url: str, ts_micros: int, text: str | None) -> bytes:
    """One deterministic WET ``conversion`` record, uncompressed."""
    body = (text or "").encode("utf-8")
    # exact integer datetime arithmetic, mirroring the read side's
    # _warc_ts_micros: fromtimestamp(ts/1e6) goes through a float and
    # misrounds microseconds for very large timestamps, breaking the
    # WET write->read identity
    ts = _EPOCH + timedelta(microseconds=int(ts_micros or 0))
    rec_id = hashlib.md5(
        f"{url}\x00{ts_micros}".encode("utf-8", "surrogateescape")
    ).hexdigest()
    head = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: conversion" + CRLF
        + b"WARC-Target-URI: " + url.encode("utf-8", "surrogateescape") + CRLF
        + b"WARC-Date: "
        + ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode() + CRLF
        + b"WARC-Record-ID: <urn:md5:" + rec_id.encode() + b">" + CRLF
        + b"Content-Type: text/plain" + CRLF
        + b"Content-Length: " + str(len(body)).encode() + CRLF
        + CRLF
    )
    return head + body + CRLF + CRLF


def _gzip_member(record: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return c.compress(record) + c.flush()


def write_wet_files(
    pages: DataFrame,
    output_dir: str,
    compress: bool = True,
    run_token: str | None = None,
) -> DataFrame:
    """Stream ``(url, warc_ts, text)`` rows into WET files, one per
    partition; returns the lineage frame ``(file, n_records,
    n_bytes)`` (uncompressed record bytes).

    Empty partitions produce no file.  The lineage frame is the
    action: consuming it (count/collect/write) runs the export.

    ``run_token`` namespaces the export (e.g. the snapshot id), so
    repeated exports into one directory — the --resume flow exports
    only each run's new rows — coexist instead of silently replacing
    the previous run's files.  With or without a token, an existing
    file at the target name raises rather than being overwritten, and
    each file is written to a temp name then ``os.replace``d so a
    retried/speculative task can never leave a torn or racing file.
    """
    os.makedirs(output_dir, exist_ok=True)
    ext = ".warc.wet.gz" if compress else ".warc.wet"
    prefix = f"{run_token}-part" if run_token else "part"
    sel = pages.select(
        "url", F.unix_micros(F.col("warc_ts")).alias("ts_us"), "text"
    ).sortWithinPartitions("url")

    def _write_partition(batches):
        # mapInPandas: ONE Python call sees the whole partition as an
        # iterator of Arrow batches (no pickled Row objects), so the
        # file handle streams across batches with constant memory; the
        # inner loop is record FRAMING, which is inherently per-record
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(output_dir, f"{prefix}-{pid:05d}{ext}")
        # temp name is unique per task ATTEMPT so concurrent
        # speculative attempts never share a handle; os.replace at the
        # end publishes the file atomically (same content either way —
        # records are deterministic and partition-sorted)
        tmp = f"{path}.inprogress-{ctx.taskAttemptId()}"
        fh = None
        # if the target already exists, a prior attempt of THIS task
        # published it after os.replace but before task commit (records
        # are deterministic and partition-sorted, so the bytes are
        # identical) — treat it as already published: skip the write
        # but still count records so the lineage row is emitted, which
        # keeps task retries idempotent instead of permanently failing
        # the job on a single executor loss at the wrong moment
        published = os.path.exists(path)
        n = n_bytes = 0
        try:
            for pdf in batches:
                for url, ts_us, text in zip(
                    pdf["url"].fillna(""), pdf["ts_us"].fillna(0),
                    pdf["text"],
                ):
                    rec = wet_record(
                        str(url), int(ts_us),
                        text if isinstance(text, str) else None,
                    )
                    if fh is None and not published:
                        # lazily: empty partitions emit nothing
                        fh = open(tmp, "wb")
                    if fh is not None:
                        fh.write(_gzip_member(rec) if compress else rec)
                    n += 1
                    n_bytes += len(rec)
        finally:
            if fh is not None:
                fh.close()
        if n:
            if not published:
                os.replace(tmp, path)
            yield pd.DataFrame(
                {"file": [os.path.basename(path)], "n_records": [n],
                 "n_bytes": [n_bytes]}
            )

    return sel.mapInPandas(
        _write_partition, schema="file string, n_records long, n_bytes long"
    )
