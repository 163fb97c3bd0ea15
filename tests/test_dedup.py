"""Dedup-operator invariants the DuckDB gate can't express: the
rows-only xxhash64 simhash family must agree with the oracle-checked
md5 family on exact duplicates (identical text ⇒ identical simhash ⇒
hamming 0 under ANY token-hash family), and its plan must actually use
the cheap hash."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F
import pytest

from ragflow_ocr_spark.ops import dedup

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def dup_dir(spark, tmp_path_factory):
    """sf0.001 documents + an exact duplicate of each of the first 5
    docs (new ids offset by 10^6), as a documents.parquet the ops
    queries can read."""
    out = str(tmp_path_factory.mktemp("dupes"))
    d = spark.read.parquet(f"{SF}/documents.parquet")
    first = d.orderBy("doc_id").limit(5)
    dupes = first.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    d.unionByName(dupes).write.parquet(f"{out}/documents.parquet")
    pairs = {
        (r.doc_id, r.doc_id + 1_000_000)
        for r in first.select("doc_id").collect()
    }
    return out, pairs


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_simhash_families_agree_on_exact_duplicates(spark, dup_dir, family):
    sf_dir, want = dup_dir
    assert want
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.q_dedup_simhash(spark, sf_dir, hash_family=family).collect()
    }
    for pair in want:
        assert got.get(pair) == 0, f"{family}: exact dup {pair} not at hamming 0"


def test_simhash_fast_plan_uses_xxhash64_not_md5(spark):
    plan = _plan(dedup.q_dedup_simhash(spark, SF))
    assert "xxhash64" in plan
    assert "md5" not in plan


def test_simhash_unknown_family_raises(spark):
    with pytest.raises(ValueError, match="hash_family"):
        dedup.q_dedup_simhash(spark, SF, hash_family="sha1")


def test_dedup_clusters_groups_duplicates_and_labels_singletons(spark, dup_dir):
    sf_dir, pairs = dup_dir
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.q_dedup_clusters(spark, sf_dir).collect()
    }
    # every doc labeled exactly once
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(labels) == n_docs
    # each duplicated doc shares its clone's cluster, labeled by min id
    for orig, clone in pairs:
        assert labels[orig] == labels[clone] == min(orig, clone)
    # labels are component minima: a cluster id always labels itself
    for cid in set(labels.values()):
        assert labels[cid] == cid
