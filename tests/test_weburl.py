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


def test_pii_scrub_finds_and_redacts_injected_pii(spark):
    """Guards the regex family against the silent-zero trap: an
    over-escaped pattern matches nothing in BOTH engines and the
    oracle hash still agrees — so pin that the injected positives
    actually fire and the placeholders land in the scrubbed text."""
    from ragflow_ocr_spark.ops.textstats import q_pii_scrub

    rows = q_pii_scrub(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_emails"] for r in rows) > 0
    assert sum(r["n_phones"] for r in rows) > 0
    assert sum(r["n_ips"] for r in rows) > 0
    by_id = {r["doc_id"]: r for r in rows}
    hit = by_id[0]  # doc 0: email+phone+ip (0 % 5 == 0 % 7 == 0 % 11 == 0)
    assert (hit["n_emails"], hit["n_phones"], hit["n_ips"]) == (1, 1, 1)
    clean = by_id[1]  # doc 1 gets no injection
    assert (clean["n_emails"], clean["n_phones"], clean["n_ips"]) == (0, 0, 0)
    assert clean["len_delta"] == 0


def test_stratified_sample_exact_quotas(spark):
    """Every (lang, source) stratum yields at most 5 rows and ranks
    are the contiguous prefix 1..n."""
    from collections import defaultdict

    from ragflow_ocr_spark.ops.weburl import q_stratified_sample

    rows = q_stratified_sample(spark, "/root/testdata/sf0.001").collect()
    cells = defaultdict(list)
    for r in rows:
        cells[(r["lang"], r["source"])].append(r["rn"])
    assert cells
    for rns in cells.values():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 5


def test_pack_sequences_offsets_are_contiguous(spark):
    """Offsets must reproduce the exact global concatenation order:
    doc N's offset = doc N-1's offset + its token count, starting at
    0 — across chunk boundaries of the three-level prefix sum."""
    from ragflow_ocr_spark.ops.textstats import q_pack_sequences

    rows = sorted(
        q_pack_sequences(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["doc_id"],
    )
    assert rows[0]["tok_offset"] == 0
    run = 0
    for r in rows:
        assert r["tok_offset"] == run, r
        run += r["n_tokens"]
        assert r["first_seq"] == r["tok_offset"] // 512
        if r["n_tokens"]:
            assert r["last_seq"] == (r["tok_offset"] + r["n_tokens"] - 1) // 512


def test_pack_sequences_three_levels_exercised_and_bounded(spark):
    """With chunk=3 the 500-doc corpus forces MANY chunks (167) and
    MANY superchunks (56), so every level of the distributed prefix
    sum carries real work — and the result must be byte-identical to
    the default-chunk run. Also pins the top-level bound: the only
    unpartitioned window runs over n_docs/chunk² rows, so at the
    production chunk (1000) a 10¹⁰-doc corpus feeds it 10 rows."""
    from ragflow_ocr_spark.ops.textstats import _PACK_CHUNK, q_pack_sequences

    sf = "/root/testdata/sf0.001"
    small = {
        r["doc_id"]: tuple(r)
        for r in q_pack_sequences(spark, sf, chunk=3).collect()
    }
    default = {
        r["doc_id"]: tuple(r) for r in q_pack_sequences(spark, sf).collect()
    }
    assert small == default
    n_docs = 500
    assert -(-n_docs // 3) >= 3 * 3  # chunk=3 really has >1 superchunk
    assert 10**10 / _PACK_CHUNK**2 <= 1e4  # top-level single-task bound


def test_chunk_documents_cover_every_token_with_overlap(spark):
    """Chunks tile each document: starts at stride 24, spans capped at
    32 tokens, last chunk ends exactly at n_tokens, consecutive chunks
    overlap unless the doc ended."""
    from ragflow_ocr_spark.ops.textstats import q_chunk_documents

    rows = q_chunk_documents(spark, "/root/testdata/sf0.001").collect()
    from collections import defaultdict

    docs = defaultdict(list)
    for r in rows:
        docs[r["doc_id"]].append(r)
    assert any(len(v) > 1 for v in docs.values())  # multi-chunk docs exist
    for chunks in docs.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        for i, c in enumerate(chunks):
            assert c["chunk_idx"] == i
            assert c["tok_start"] == i * 24
            assert c["tok_end"] - c["tok_start"] == c["n_tok_chunk"] <= 32
            if i + 1 < len(chunks):
                assert c["tok_end"] > chunks[i + 1]["tok_start"]  # overlap
