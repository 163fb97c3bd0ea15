"""Semantics pins for the corpus-curation operators (ops/curation.py).

The oracle gate proves Spark==DuckDB on the synthesized corpus; these
pin the *rules* on hand-built corpora where the right answer is
known by construction: keeper selection, island merging, short-doc
passthrough for `dedup_substring`; copy-count bounds and
partitioning-independence for `mixture_sample`.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ragflow_ocr_spark.ops.curation import (
    MIX_BP,
    SUBSTR_K,
    q_dedup_substring,
    q_mixture_sample,
)

RUN = "tok0 tok1 tok2 tok3 tok4 tok5 tok6 tok7"  # exactly K=8 tokens
assert len(RUN.split()) == SUBSTR_K


def _write_docs(tmp_path, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    df = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "lang": langs,
            "source": ["src1"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def test_substring_dedup_keeps_first_corpus_occurrence(spark, tmp_path):
    # doc 1 holds the keeper (min (doc_id, pos)); doc 2's copy is cut
    sf = _write_docs(
        tmp_path,
        [
            RUN + " xa xb xc",
            "ya yb " + RUN + " yc",
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf).collect()}
    assert out[1].clean_text == RUN + " xa xb xc"
    assert out[1].n_removed == 0 and out[1].n_spans == 0
    assert out[2].clean_text == "ya yb yc"
    assert out[2].n_removed == SUBSTR_K and out[2].n_spans == 1


def test_substring_dedup_merges_overlapping_windows(spark, tmp_path):
    # a duplicated run of K+1 tokens → two overlapping duplicated
    # K-grams in the copy, merged into ONE island of K+1 tokens
    run9 = RUN + " tok8"
    sf = _write_docs(
        tmp_path,
        [
            run9 + " xa",
            "ya " + run9 + " yb",
        ],
    )
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf).collect()}
    assert out[2].clean_text == "ya yb"
    assert out[2].n_removed == SUBSTR_K + 1
    assert out[2].n_spans == 1


def test_substring_dedup_within_doc_repeat(spark, tmp_path):
    # same doc repeats its own K-gram: first position is the keeper
    sf = _write_docs(tmp_path, [RUN + " mid " + RUN])
    (row,) = q_dedup_substring(spark, sf).collect()
    assert row.clean_text == RUN + " mid"
    assert row.n_removed == SUBSTR_K and row.n_spans == 1


def test_substring_dedup_short_doc_passthrough(spark, tmp_path):
    short = "a b c"  # < K tokens: no grams, untouched
    sf = _write_docs(tmp_path, [short, RUN + " z"])
    out = {r.doc_id: r for r in q_dedup_substring(spark, sf).collect()}
    assert out[1].clean_text == short
    assert out[1].n_removed == 0 and out[1].n_spans == 0


def test_mixture_sample_copy_count_bounds(spark, tmp_path):
    # en: bp=23000 → every doc 2 or 3 copies; de: bp=4000 → 0 or 1
    texts = [f"doc {i}" for i in range(40)]
    langs = ["en"] * 20 + ["de"] * 20
    sf = _write_docs(tmp_path, texts, langs)
    rows = q_mixture_sample(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.lang), []).append(r.copy_idx)
    for (doc_id, lang), idxs in by_doc.items():
        lo = MIX_BP[lang] // 10000
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
        assert len(idxs) in (lo, lo + 1), (doc_id, lang, idxs)
    # every en doc present (weight ≥ 1); de docs may drop (weight < 1)
    en_docs = {d for (d, lang) in by_doc if lang == "en"}
    assert en_docs == set(range(1, 21))
    de_copies = sum(len(v) for (d, lang), v in by_doc.items() if lang == "de")
    assert 0 < de_copies < 20  # fractional downsample actually samples


def test_mixture_sample_partitioning_independent(spark, tmp_path):
    sf = _write_docs(tmp_path, [f"doc {i}" for i in range(30)])
    a = sorted(map(tuple, q_mixture_sample(spark, sf).collect()))
    b = sorted(
        map(
            tuple,
            q_mixture_sample(spark, sf).repartition(7).collect(),
        )
    )
    assert a == b
