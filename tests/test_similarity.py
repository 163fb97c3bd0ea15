"""Banded hyperplane-LSH ANN (ops/similarity.py): recall structure,
bucket-occupancy scaling rule, and the deterministic exact-duplicate
guarantee (identical vectors share every band bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ragflow_ocr_spark.ops import similarity
from ragflow_ocr_spark.ops.similarity import (
    N_LSH_BANDS,
    PLANES_PER_BAND,
    planes_per_band_for,
    q_ann_lsh_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from ragflow_ocr_spark.spark.session import get_spark

    return get_spark(app_name="test-similarity", master="local[4]")


def test_lsh_banded_finds_exact_duplicates_deterministically(spark, tmp_path):
    """An exact copy of a vector lands in the SAME bucket in every
    band regardless of plane constants, so the duplicate pair is found
    with n_bands_hit = B and cos = 1 — LSH recall is probabilistic for
    near-dups but certain for exact dups."""
    out = str(tmp_path)
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    copy = e.where(F.col("vec_id") == 7).withColumn(
        "vec_id", F.lit(1_000_000).cast("long")
    )
    e.unionByName(copy).write.parquet(f"{out}/embeddings.parquet")
    rows = {
        (r["id_a"], r["id_b"]): r for r in q_ann_lsh_bucketed(spark, out).collect()
    }
    hit = rows[(7, 1_000_000)]
    assert hit["n_bands_hit"] == N_LSH_BANDS
    assert hit["cos"] == 1.0


def test_lsh_banded_structure(spark):
    """Band hits are bounded by the band count; every surfaced pair is
    exactly scored (re-check cosine against numpy) and crosses the
    0.25 threshold on the ROUNDED value both engines compare."""
    import numpy as np

    rows = q_ann_lsh_bucketed(spark, SF).collect()
    assert rows, "test corpus must produce candidate pairs"
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    assert any(r["n_bands_hit"] > 1 for r in rows)  # multi-band hits exist
    for r in rows:
        assert 1 <= r["n_bands_hit"] <= N_LSH_BANDS
        a, b = emb[r["id_a"]], emb[r["id_b"]]
        cos = float(a @ b / (np.sqrt(a @ a) * np.sqrt(b @ b)))
        assert abs(cos - r["cos"]) < 2e-6
        assert r["cos"] >= 0.25


def test_planes_per_band_scaling_rule():
    """r grows with log2(n): expected per-band bucket occupancy
    n / 2^r stays ≤ the target as the corpus grows — the property the
    round-3 constant-plane formulation lacked (and the fixed-r banded
    version still lacked: the sf1 rung measured a 5.2× per-row cost
    ratio at 20k vectors before the registered query adopted this
    rule). The floor keeps r = 8 for every oracle-checked corpus
    (≤ 2048 vectors), so the static DuckDB mirror stays exact."""
    assert planes_per_band_for(1_000) == PLANES_PER_BAND  # floor
    assert planes_per_band_for(2_048) == PLANES_PER_BAND  # oracle edge
    for n in (10**5, 10**6, 10**9, 10**12):
        r = planes_per_band_for(n)
        assert n / 2**r <= 8  # occupancy bounded by the target
    assert planes_per_band_for(20_000) == 12  # the sf1 rung regime
    assert planes_per_band_for(10**9) == 27


def test_lsh_more_bands_only_add_recall(spark):
    """Band 0 uses plane indices 0..r-1 in every configuration, so the
    single-table run's pairs are a strict subset of the banded run's —
    extra bands are pure recall, never a semantic change."""
    one = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in q_ann_lsh_bucketed(spark, SF, n_bands=1).collect()
    }
    four = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in q_ann_lsh_bucketed(spark, SF, n_bands=N_LSH_BANDS).collect()
    }
    assert set(one) <= set(four)
    assert len(four) > len(one)  # the extra tables do add candidates
    for k, cos in one.items():
        assert four[k] == cos  # scoring independent of band count


def test_lsh_bucket_cap_bounds_candidates_and_is_subset(spark):
    """The deterministic bucket cap keeps candidate work linear on
    cluster-quadratic corpora: capped output is a subset of uncapped
    output, and with cap=2 each (band, bucket) contributes at most one
    pair."""
    capped = {
        (r["id_a"], r["id_b"]) for r in
        q_ann_lsh_bucketed(spark, SF, max_bucket=2).collect()
    }
    full = {
        (r["id_a"], r["id_b"]) for r in
        q_ann_lsh_bucketed(spark, SF, max_bucket=1_000_000).collect()
    }
    assert capped <= full
    assert len(capped) < len(full)
    # ≤ one pair per (band, bucket): at 4 bands × ≤256 buckets that is
    # a hard ceiling far below the uncapped pair count on this corpus
    assert len(capped) <= 4 * 256
