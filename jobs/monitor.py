"""Recrawl monitor job: continuous per-url freshness verdicts.

Drives :func:`pdf_parser_spark.streaming.recrawl.stream_recrawl` over
a landing directory of recrawled page files: every arrival is
classified against the url's last content signature (added / changed /
unchanged), urls not re-crawled within the event-time TTL surface once
as ``stale``, and the per-url latest verdict is summarized into a
freshness report — the feed a recrawl scheduler consumes.

``--mode neardup`` runs the OTHER continuous monitor instead:
:func:`pdf_parser_spark.streaming.neardup.stream_neardup`, the
MinHash-LSH near-dup admission gate (per-band keeper-signature state,
TTL-evicted per freshness window), summarized into a per-url
admission report.

Run:  spark-submit --py-files dist/engine.zip jobs/monitor.py \\
          --input '/path/landing/*/' --output /path/freshness \\
          --checkpoint /path/freshness-cp --ttl-hours 24 \\
          [--mode freshness|neardup]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True,
                    help="landing dir glob of page parquet files")
    ap.add_argument("--output", required=True, help="verdicts output dir")
    ap.add_argument("--checkpoint", required=True,
                    help="streaming checkpoint dir (state store lives here)")
    ap.add_argument("--ttl-hours", type=float, default=24.0,
                    help="event-time freshness window before `stale`")
    ap.add_argument("--mode", choices=["freshness", "neardup"],
                    default="freshness",
                    help="freshness verdicts or near-dup admission")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pdf_parser_spark.spark.session import build_session
    from pdf_parser_spark.streaming.recrawl import (
        freshness_report,
        stream_recrawl,
    )

    spark = build_session("pdf-parser-spark-monitor", master=args.master)
    if args.mode == "neardup":
        from pdf_parser_spark.streaming.neardup import (
            admission_report,
            stream_neardup,
        )

        stream_neardup(
            spark,
            args.input,
            args.output,
            args.checkpoint,
            ttl_ms=int(args.ttl_hours * 3600 * 1000),
        )
        report = admission_report(spark, args.output)
        report.write.mode("overwrite").parquet(f"{args.output}/latest")
        n_adm = report.filter("admitted").count()
        n_all = report.count()
        summary = {"ttl_hours": args.ttl_hours, "mode": "neardup",
                   "urls": n_all, "admitted": n_adm,
                   "near_dups": n_all - n_adm}
        with open(f"{args.output}/monitor.json", "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps(summary))
        spark.stop()
        return

    stream_recrawl(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        ttl_ms=int(args.ttl_hours * 3600 * 1000),
    )
    report = freshness_report(spark, args.output)
    report.write.mode("overwrite").parquet(f"{args.output}/latest")
    counts = {
        r["status"]: r["n"]
        for r in report.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    summary = {"ttl_hours": args.ttl_hours, "urls": sum(counts.values()),
               "by_status": counts}
    with open(f"{args.output}/monitor.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
