"""Staged detect/recognize API tests (SURVEY.md §3.2): the two-stage
path must agree with the fused pipeline, and the batch-rec drop
semantics (emit "" below drop_score) must differ from the fused
pipeline's drop semantics exactly as in the reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ragflow_ocr_spark.kernels import font5x7, pngcodec
from ragflow_ocr_spark.spark.pipeline import detect_blocks, extract, recognize_blocks


@pytest.fixture(scope="module")
def png_pages(spark):
    rows = []
    for i, lines in enumerate(
        [["STAGED API TEST", "SECOND LINE"], ["ANOTHER PAGE 42"]]
    ):
        img, drawn = font5x7.render_page(lines, width=960, height=256, scale=2)
        rows.append(
            ("url%d" % i, None, bytearray(pngcodec.encode_png(img)), None, "en", "\n".join(drawn))
        )
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string, expected string",
    )
    return df.cache()


def test_detect_emits_ordered_blocks(png_pages):
    det = detect_blocks(png_pages)
    rows = {r["url"]: r for r in det.collect()}
    assert rows["url0"]["det_status"] == "ok"
    blocks = rows["url0"]["blocks"]
    assert len(blocks) == 2
    assert [b["block_id"] for b in blocks] == [0, 1]
    # reading order: first block is the upper line
    assert blocks[0]["bbox"][0][1] < blocks[1]["bbox"][0][1]


def test_staged_equals_fused(png_pages):
    det = detect_blocks(png_pages)
    lines = recognize_blocks(det)
    # deterministic reassembly: sort the collected (block_id, text)
    # structs, then join texts — collect_list alone has no order
    staged = lines.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("block_id", "text"))),
                lambda s: s.getField("text"),
            ),
            "\n",
        ).alias("text")
    )
    fused = extract(png_pages.drop("expected"))
    s = {r["url"]: r["text"] for r in staged.collect()}
    f = {r["url"]: r["extracted_text"] for r in fused.collect()}
    e = {r["url"]: r["expected"] for r in png_pages.select("url", "expected").collect()}
    for url, expected in e.items():
        assert f[url] == expected
        assert s[url] == expected


def test_detect_handles_bad_payloads(spark):
    df = spark.createDataFrame(
        [("u0", None, None, None, None), ("u1", None, bytearray(b"\x89PNG\r\n\x1a\nxx"), None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    rows = {r["url"]: r for r in detect_blocks(df).collect()}
    assert rows["u0"]["det_status"] == "skip:null"
    assert rows["u1"]["det_status"] == "error:decode"
    assert rows["u0"]["blocks"] == []
