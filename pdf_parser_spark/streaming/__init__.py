from pdf_parser_spark.streaming.job import stream_extract
from pdf_parser_spark.streaming.sessionize import (
    final_sessions,
    stream_sessionize,
)

__all__ = ["stream_extract", "stream_sessionize", "final_sessions"]
