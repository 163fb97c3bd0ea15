"""URL canonicalization semantics pins (ops/weburl.py) — the oracle
gate proves Spark==DuckDB on the synthesized corpus; these pin the
canonicalization rules themselves on hand-picked edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ragflow_ocr_spark.ops.weburl import _canonicalize


@pytest.mark.parametrize(
    "raw,want",
    [
        # case folding + www strip
        ("HTTPS://WWW.SRC1.Example.COM/Article/7", "https://src1.example.com/article/7"),
        # fragment stripped
        ("https://a.com/x#frag", "https://a.com/x"),
        # utm-only query stripped
        ("https://a.com/x?utm_source=feed&utm_campaign=x", "https://a.com/x"),
        # non-utm query KEPT (conservative: only tracking-only queries go)
        ("https://a.com/x?page=2", "https://a.com/x?page=2"),
        # trailing slash stripped
        ("https://a.com/x/", "https://a.com/x"),
        # all at once
        (
            "HTTP://www.B.com/Y/?utm_medium=z#top",
            "http://b.com/y",
        ),
        # www only stripped as host prefix, not mid-path
        ("https://a.com/www.keep", "https://a.com/www.keep"),
    ],
)
def test_canonicalize_rules(spark, raw, want):
    row = spark.range(1).select(_canonicalize(F.lit(raw)).alias("c")).first()
    assert row.c == want


def test_canonicalize_order_matters(spark):
    """Fragment strip must precede the utm strip ('?utm...#frag' ends
    with the fragment, not the query) and the trailing-slash strip
    ('.../?utm' leaves a trailing slash behind)."""
    raw = "https://www.a.com/p/?utm_source=s#sec"
    row = spark.range(1).select(_canonicalize(F.lit(raw)).alias("c")).first()
    assert row.c == "https://a.com/p"
