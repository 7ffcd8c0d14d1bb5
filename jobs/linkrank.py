"""Host-authority job: PageRank over the REAL extracted link graph.

Launch (cluster)::

    spark-submit --py-files dist/engine.zip jobs/linkrank.py \
        --input iceberg:cc.pages --output iceberg:cc.host_ranks

Launch (sandbox / local smoke)::

    python jobs/linkrank.py --input /tmp/pages.parquet \
        --output /tmp/host_ranks

Pipeline: read pages (url, html) — column-pruned to exactly those two
— → Arrow-batched outlink UDF (html/links.py; HTML rows only, PDF
payloads are sniffed out before the UDF) → distinct (src_host,
dst_host) edges → the exact-integer damped power iteration shared
with the oracled derived-graph op
(ops/linkgraph.py:pagerank_over_edges) → (host, pagerank_e9,
out_degree) parquet.

Scale shape: the corpus is touched ONCE, by the edge-extraction scan;
everything after operates on the O(hosts)/O(links) graph (persisted —
see pagerank_over_edges' lineage note).  Edge extraction is
embarrassingly parallel; the per-iteration shuffle carries (dst,
contrib) longs keyed by host, and AQE broadcasts the rank table onto
the edge list while hosts are few.

``--harmonic`` additionally emits HyperBall harmonic centrality
(harmonic_e6, ops/centrality.py) over the SAME persisted edge
relation — the second recurrence costs O(hosts × 16) register rows
per radius, never another corpus scan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.pandas.functions import pandas_udf  # noqa: E402


def _make_outlinks_udf():
    @pandas_udf("array<string>")
    def outlinks(url: pd.Series, html: pd.Series) -> pd.Series:
        from pdf_parser_spark.html.links import outlink_hosts

        out = []
        for u, payload in zip(url, html):
            if payload is None or bytes(payload[:5]) == b"%PDF-":
                out.append([])
                continue
            out.append(
                outlink_hosts(u or "", bytes(payload).decode("latin-1"))
            )
        return pd.Series(out)

    return outlinks


def host_edges(pages: DataFrame) -> DataFrame:
    """Distinct (src, dst) host pairs from the pages' anchor tags."""
    udf = _make_outlinks_udf()
    return (
        pages.select(
            F.expr("parse_url(url, 'HOST')").alias("src"),
            F.explode(udf(F.col("url"), F.col("html"))).alias("dst"),
        )
        .filter(F.col("src").isNotNull())
        .distinct()
    )


def host_ranks(
    pages: DataFrame, iters: int = 3, harmonic: bool = False
) -> DataFrame:
    from pdf_parser_spark.ops.linkgraph import pagerank_over_edges

    edges = host_edges(pages)
    ranks = pagerank_over_edges(edges, iters).selectExpr(
        "node AS host",
        "pr AS pagerank_e9",
        "outdeg AS out_degree",
    )
    if not harmonic:
        return ranks
    # HyperBall harmonic centrality over the SAME edge relation
    # (persisted inside both recurrences, so the corpus-scanning edge
    # extraction still runs once); node set is identical by
    # construction, so the join is an O(hosts) equi-join
    from pdf_parser_spark.ops.centrality import hyperball_over_edges

    hb = hyperball_over_edges(edges, radius=iters).selectExpr(
        "node AS host", "harmonic_e6"
    )
    return ranks.join(hb, "host")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="pages table (parquet dir)")
    ap.add_argument("--output", required=True, help="host-rank output dir")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--harmonic",
        action="store_true",
        help="also emit HyperBall harmonic centrality (harmonic_e6)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pdf_parser_spark.spark.session import build_session

    spark = build_session("pdf-parser-spark-linkrank", master=args.master)
    pages = spark.read.parquet(args.input)
    ranks = host_ranks(pages, args.iters, harmonic=args.harmonic)
    ranks.write.mode("overwrite").parquet(args.output)
    top = ranks.orderBy(F.desc("pagerank_e9")).limit(10).collect()
    for r in top:
        print(f"{r.pagerank_e9:>12d}  out={r.out_degree:<4d} {r.host}")


if __name__ == "__main__":
    main()
