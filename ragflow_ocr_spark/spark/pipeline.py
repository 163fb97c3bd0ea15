"""End-to-end extraction pipeline (the flagship job — P1 in SURVEY.md
§2.9, Spark lifecycle in §3.1).

    pages ──(anti-join done buckets)──> size-aware spread ──>
    mapInPandas(extract) ──> extracted rows + per-partition metrics

Scale design (SURVEY.md §4):
- **Size-aware skew spread**: per-document cost is unknown pre-detect
  but correlates with payload bytes. Heavy rows
  (``length(html) > salt_heavy_bytes``) are range-spread to ~one per
  partition and their partitions scheduled FIRST, while light rows use
  plain hash(url) — AQE cannot rebalance inside a mapInPandas stage,
  so this is manual (a 100× skew row otherwise pins one executor at
  the end of the stage).
- **Projection discipline**: the extract output never carries `html`,
  so every downstream projection prunes payload bytes at the stage
  boundary.
- **Resume**: work is bucketed by pmod(xxhash64(url), n_buckets);
  completed buckets are anti-joined out (broadcast — checkpoint side
  is tiny) and each bucket's output is idempotently overwritten.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_ocr_spark.config import DEFAULT, PipelineConfig
from ragflow_ocr_spark.spark.checkpoint import CheckpointStore
from ragflow_ocr_spark.spark.stages import (
    EXTRACT_METRICS_SCHEMA,
    EXTRACT_SCHEMA,
    extract_stage,
    extract_stage_with_metrics,
)


def spread_for_extract(
    df: DataFrame, n_partitions: int, cfg: PipelineConfig = DEFAULT
) -> DataFrame:
    """Distribute rows so heavy payloads can't gang up on one task.

    A heavy page is ONE row — it cannot be split, so "skew handling"
    here means the heavy subset must land ~evenly across partitions by
    COUNT. Hash repartitioning doesn't guarantee that: when the number
    of heavy rows is comparable to the number of partitions (the
    painful regime — each one is ~100× a median row), balls-in-bins
    puts 2-3 in one partition and zero in others. ``repartitionByRange``
    over ``xxhash64(url)`` samples the key distribution and emits
    near-equal-count ranges → at most ~1 heavy row per partition at
    the tail, at any scale. Light rows: plain hash(url) repartition.
    Placement never affects output bytes — rows are independent
    (verified by the repartition-invariance test).
    """
    cost = F.coalesce(F.length(F.col("html")), F.lit(0))
    heavy = df.where(cost > cfg.salt_heavy_bytes)
    light = df.where(cost <= cfg.salt_heavy_bytes)
    heavy = heavy.repartitionByRange(n_partitions, F.xxhash64(F.col("url")))
    light = light.repartition(n_partitions, F.col("url"))
    # heavy FIRST: union concatenates partition lists in order and the
    # scheduler issues them in order — longest-processing-time-first
    # keeps the ~100× rows off the stage's tail
    return heavy.unionByName(light)


def extract(
    df: DataFrame,
    cfg: PipelineConfig = DEFAULT,
    n_partitions: int | None = None,
) -> DataFrame:
    """pages DataFrame → extracted DataFrame (EXTRACT_SCHEMA)."""
    if n_partitions:
        df = spread_for_extract(df, n_partitions, cfg)
    return df.select("url", "warc_ts", "lang", "html").mapInPandas(
        extract_stage(cfg), schema=EXTRACT_SCHEMA
    )


def detect_blocks(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Staged API (SURVEY.md §3.2): pages → pages + nested blocks."""
    from ragflow_ocr_spark.spark.stages import DETECT_SCHEMA, detect_stage

    return df.select("url", "warc_ts", "lang", "html").mapInPandas(
        detect_stage(cfg), schema=DETECT_SCHEMA
    )


def recognize_blocks(df: DataFrame, cfg: PipelineConfig = DEFAULT) -> DataFrame:
    """Staged API: detected pages → exploded recognized lines."""
    from ragflow_ocr_spark.spark.stages import RECOGNIZE_SCHEMA, recognize_stage

    return df.mapInPandas(recognize_stage(cfg), schema=RECOGNIZE_SCHEMA)


def run_extract_job(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    n_buckets: int = 32,
    cfg: PipelineConfig = DEFAULT,
    fail_buckets: set[int] | None = None,
) -> dict:
    """Resumable extraction job with per-bucket checkpointing.

    ``fail_buckets`` injects a simulated failure after the listed
    buckets complete — used by the resume test (kill-after-k
    semantics). Returns run summary counters.
    """
    ckpt = CheckpointStore(spark, out_root)
    run_id = uuid.uuid4().hex[:12]

    work = pages.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )
    done = ckpt.done_buckets()
    pending = work.join(F.broadcast(done), on="bucket", how="left_anti")

    # deterministic per-bucket processing; buckets are the resume unit
    pending_buckets = [r["bucket"] for r in pending.select("bucket").distinct().collect()]
    pending_buckets.sort()

    n_processed = 0
    for b in sorted(pending_buckets):
        bucket_df = pending.where(F.col("bucket") == b).drop("bucket")
        out = bucket_df.select("url", "warc_ts", "lang", "html").mapInPandas(
            extract_stage_with_metrics(cfg, run_id), schema=EXTRACT_METRICS_SCHEMA
        )
        out = out.cache()
        try:
            data_rows = out.where(F.col("engine") != "_metrics").drop("part_id")
            (
                data_rows.write.mode("overwrite").parquet(
                    f"{out_root}/extracted/bucket={b}"
                )
            )
            metric_rows = out.where(F.col("engine") == "_metrics").collect()
            stats = CheckpointStore.parse_metrics_rows(metric_rows)
            agg = {
                "run_id": run_id,
                "bucket": b,
                "n_docs": sum(s["n_docs"] for s in stats),
                "n_ok": sum(s["n_ok"] for s in stats),
                "n_empty": sum(s["n_empty"] for s in stats),
                "n_error": sum(s["n_error"] for s in stats),
                "wall_ms": max((s["wall_ms"] for s in stats), default=0),
            }
            ckpt.mark_done([agg])
            n_processed += 1
        finally:
            out.unpersist()
        if fail_buckets and b in fail_buckets:
            raise RuntimeError(f"injected failure after bucket {b}")

    return {
        "run_id": run_id,
        "buckets_processed": n_processed,
        "buckets_skipped": n_buckets - len(pending_buckets),
    }


def read_extracted(spark: SparkSession, out_root: str) -> DataFrame:
    return spark.read.parquet(f"{out_root}/extracted")
