from pdf_parser_spark.sources.warc import parse_warc, read_warc_pages, write_warc

__all__ = ["parse_warc", "read_warc_pages", "write_warc"]
