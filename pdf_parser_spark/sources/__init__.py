from pdf_parser_spark.sources.warc import (
    parse_warc,
    read_warc_pages,
    read_warc_raw,
    warc_lineage,
    write_warc,
)

__all__ = [
    "parse_warc",
    "read_warc_pages",
    "read_warc_raw",
    "warc_lineage",
    "write_warc",
]
