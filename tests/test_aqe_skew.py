"""AQE skew-join handling — the runtime half of the skew story (the
compile-time half is spread_for_extract's heavy-row range spread, which
covers the mapInPandas stage AQE cannot rebalance; joins it CAN):
a hot join key gets its shuffle partition split at runtime
(SortMergeJoin(skew=true)) instead of pinning one task."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

AQE_CONF = {
    # thresholds scaled down so the pytest-sized input triggers the
    # same decisions a multi-GB hot key triggers at the defaults
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture(scope="module")
def aqe_spark(spark):
    # these are runtime SQL confs — set on the shared session, restore
    # after (builder confs are ignored by getOrCreate on a live session)
    saved = {}
    for k, v in AQE_CONF.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_skewed_join_is_split_at_runtime(aqe_spark):
    spark = aqe_spark
    # 90% of the fact side lands on key 0
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("payload-padding-padding-"), F.col("id").cast("string")).alias("v"),
    )
    dim = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    j = fact.join(dim.hint("merge"), "k")
    rows = j.collect()  # collect() finalizes THIS DataFrame's adaptive plan
    assert len(rows) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan[:2500]
    assert "skewed" in plan  # AQEShuffleRead "coalesced and skewed"


def test_uniform_join_is_not_split(aqe_spark):
    """Control: same shape without the hot key — no skew handling."""
    spark = aqe_spark
    fact = spark.range(0, 200_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-padding-padding-"), F.col("id").cast("string")).alias("v"),
    )
    dim = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )
    j = fact.join(dim.hint("merge"), "k")
    assert len(j.collect()) == 200_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "skew=true" not in plan
