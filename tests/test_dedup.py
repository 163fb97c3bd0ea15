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


def test_connected_components_long_chain_olog_rounds(spark):
    """A 256-node path graph converges in O(log n) star rounds (min-label
    propagation would need ~n rounds) and labels every node with the
    chain minimum."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    nodes = spark.range(n).withColumnRenamed("id", "doc_id")
    labels, rounds = dedup.connected_components(edges, nodes)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # theory: ~log2(n) alternating rounds (+1 to observe the fixpoint)
    assert rounds <= 12, f"chain of {n} took {rounds} rounds"


def test_connected_components_mixed_graph(spark):
    """Two components + singletons; edge orientation and duplicates are
    irrelevant; labels are component minima."""
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 5), (20, 21), (21, 20), (20, 22)],
        "src long, dst long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [3, 5, 9, 20, 21, 22, 40, 41]], "doc_id long"
    )
    labels, _ = dedup.connected_components(edges, nodes)
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20, 40: 40, 41: 41}


def test_connected_components_empty_edges(spark):
    nodes = spark.range(4).withColumnRenamed("id", "doc_id")
    edges = spark.createDataFrame([], "src long, dst long")
    labels, _ = dedup.connected_components(edges, nodes)
    assert {r.doc_id: r.label for r in labels.collect()} == {
        i: i for i in range(4)
    }


def test_simhash_packed_votes_match_unpacked_reference(spark, dup_dir):
    """The packed 21-bit-lane vote aggregation must produce the exact
    simhash a naive per-bit ±count vote produces (pinned on real docs
    by recomputing the naive votes in pandas)."""
    sf_dir, _ = dup_dir
    import collections
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    rows = docs.select("doc_id", "text").collect()
    want = {}
    for r in rows:
        votes = [0] * dedup.SIMHASH_BITS
        toks = [t for t in (r.text or "").split(" ") if t]
        if not toks:
            continue
        for tok, c in collections.Counter(toks).items():
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for i in range(dedup.SIMHASH_BITS):
                votes[i] += c if (h >> i) & 1 else -c
        want[r.doc_id] = sum(
            (1 << i) for i in range(dedup.SIMHASH_BITS) if votes[i] > 0
        )
    d = spark.createDataFrame(
        [(r.doc_id, r.text) for r in rows], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.simhash
        for r in dedup.simhash_values(d, hash_family="md5").collect()
    }
    assert got == want


def test_simhash_lane_overflow_raises_not_wraps(spark):
    """A document whose token count exceeds a 21-bit vote lane must
    fail loudly (assert_true), never silently wrap into a wrong hash."""
    d = spark.createDataFrame(
        [(1, "x " * ((1 << dedup._LANE_BITS) + 8))], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="lane overflow"):
        dedup.simhash_values(d, hash_family="md5").collect()


def test_dedup_incremental_flags_straddling_dups(spark, tmp_path):
    """An exact copy of an OLD doc placed in the NEW slice (doc_id
    % 100 == 0) must be flagged with that old partner named at J=1;
    new docs without an old match stay is_dup=0 with null columns."""
    from ragflow_ocr_spark.ops.dedup import q_dedup_incremental

    out = str(tmp_path)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    old3 = d.where(F.col("doc_id") == 3)  # 3 % 10 != 0 → old side
    copy_new = old3.withColumn("doc_id", F.lit(1_000_000).cast("long"))
    d.unionByName(copy_new).write.parquet(f"{out}/documents.parquet")
    rows = {
        r["doc_id"]: r for r in q_dedup_incremental(spark, out).collect()
    }
    hit = rows[1_000_000]
    assert hit["is_dup"] == 1
    assert hit["matched_old"] == 3
    assert hit["best_jaccard"] == 1.0
    for r in rows.values():
        if not r["is_dup"]:
            assert r["matched_old"] is None and r["best_jaccard"] is None
        else:
            assert r["matched_old"] % 100 != 0 and r["best_jaccard"] >= 0.5
