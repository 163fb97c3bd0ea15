"""Structured Streaming surface.

The reference engine is strictly batch (SURVEY.md §2.10: no
watermarks, windows, or state anywhere in `/root/reference`), so the
batch pipeline with checkpoint-resume is the primary path. This module
adds the idiomatic Spark streaming wrapper around the SAME extraction
stage for continuous-ingest deployments: a Common-Crawl-style dump
that lands as parquet files is picked up incrementally, processed
exactly-once (file-source + sink checkpoint), and monitored with a
watermarked windowed metrics aggregation.

The extract stage itself is stateless per-row, so batch and streaming
share one kernel — byte-identity between the two modes is asserted in
tests/test_streaming.py.
"""

from ragflow_ocr_spark.streaming.stateful import stream_user_totals
from ragflow_ocr_spark.streaming.stream_extract import (
    stream_extract_availablenow,
    stream_metrics_query,
)

__all__ = [
    "stream_extract_availablenow",
    "stream_metrics_query",
    "stream_user_totals",
]
