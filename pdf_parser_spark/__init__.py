"""pdf_parser_spark — a PySpark-native document-extraction engine.

A from-scratch reimplementation of the extraction semantics of the
reference Rust crate ``pdf-text-extract`` (yosephbernandus/pdf-parser),
re-expressed Spark-first: a pure-Python per-document engine
(:mod:`pdf_parser_spark.engine`) executed inside Arrow-vectorized
pandas UDFs over a Common-Crawl-style pages table
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``,
plus a DOM-heuristic HTML boilerplate stripper
(:mod:`pdf_parser_spark.html`), large-scale text ops
(:mod:`pdf_parser_spark.textops`) and the Spark job layer
(:mod:`pdf_parser_spark.spark`: skew routing, lineage, resume).
"""

__version__ = "0.1.0"
