"""Shared table access for the ops modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_fanout(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a testdata table and fan it out across the cluster.

    The sf test corpora are single parquet files → one input split;
    repartitioning before compute-heavy derivations (shingles, hashes,
    media decode) lets them use every core. At real scale the scan has
    thousands of splits and this repartition is a no-op-sized cost.
    The ONE place to change the fan-out policy — dedup, similarity,
    textstats, weburl, and multimodal all route through here.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)
