"""Bucketed co-located joins — the 100 TB pattern for repeated joins
on the same key (e.g. `extracted` ⋈ `pages` on url across pipeline
runs): both sides written bucketed by the join key join WITHOUT a
shuffle exchange on either side."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Two tables bucketed by the join key into the same bucket count."""
    n_buckets = 4
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    stats = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("score"),
    )
    for name, df in [("b_docs", docs), ("b_stats", stats)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(n_buckets, "doc_id")
            .sortBy("doc_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_docs", "b_stats"
    for name in ("b_docs", "b_stats"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    a, b = warehouse
    # hint merge: at real scale neither side broadcasts; the point is
    # that the sort-merge join reads both bucketed layouts in place
    joined = spark.table(a).hint("merge").join(spark.table(b), "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:2000]
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert joined.count() == 2000


def test_bucketed_groupby_has_no_exchange(spark, warehouse):
    """Aggregation on the bucket key also reuses the bucketing."""
    a, _ = warehouse
    agg = spark.table(a).groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    assert agg.count() == 2000


def test_unbucketed_join_needs_exchange(spark, warehouse):
    """Control: the same join without bucketing shuffles (so the
    bucketed assertions above are meaningful)."""
    a, _ = warehouse
    plain = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).alias("x")
    ).where(F.col("doc_id") >= 0)
    # defeat broadcast: force shuffle-based join path for the control
    joined = spark.table(a).join(
        plain.hint("merge"), "doc_id"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
