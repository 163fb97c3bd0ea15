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
    EXTRACT_METRICS_BUCKET_SCHEMA,
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

    Cost note: the where-split evaluates the source twice. That is
    deliberate — see run_extract_job's docstring for why the heavy
    scan is metadata-cheap on a real crawl table (content_length
    row-group pruning); caching payload bytes to avoid it would cost
    far more at 100 TB.
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
    bucket_group_size: int = 1,
    spread: bool = True,
) -> dict:
    """Resumable extraction job with bucket-granular checkpointing.

    Buckets are processed in GROUPS of ``bucket_group_size`` — one
    Spark job per group. Each job filters on ``bucket IN (group)``, so
    the number of group jobs is n_buckets/group_size, not n_buckets
    (at 100 TB the input is an Iceberg table partitioned by
    ``bucket(url, n_buckets)``, so each scan additionally prunes to
    the group's files — see spark/checkpoint.py). With ``spread=True``
    each group is scanned twice (the heavy/light where-split below);
    at Iceberg scale the heavy predicate runs against a stored
    ``content_length`` column whose row-group stats prune the heavy
    scan to the handful of files containing heavy rows, so the second
    scan is metadata-cheap — worth it to keep 100× rows off the stage
    tail. The group size is
    the classic durability/throughput knob: lost work on failure ≤ one
    group, scan overhead ∝ 1/group_size. Within a group, output lands
    via dynamic partition overwrite under ``extracted/bucket=<b>`` —
    rewriting a group is idempotent (MERGE-on-key semantics).

    ``fail_buckets`` injects a simulated failure after any group
    containing one of the listed buckets commits — the resume tests'
    kill-after-k. Returns run summary counters.
    """
    ckpt = CheckpointStore(spark, out_root)
    run_id = uuid.uuid4().hex[:12]
    bucket_of_url = F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")

    work = pages.withColumn("bucket", bucket_of_url)
    done = ckpt.done_buckets(n_buckets)  # raises on a numbering mismatch
    n_done_prior = done.count()
    pending = work.join(F.broadcast(done), on="bucket", how="left_anti")

    pending_buckets = sorted(
        r["bucket"] for r in pending.select("bucket").distinct().collect()
    )
    gs = max(1, bucket_group_size)
    groups = [pending_buckets[i : i + gs] for i in range(0, len(pending_buckets), gs)]

    # only the touched bucket= partitions are replaced on (re)write;
    # session conf restored on exit — leaving dynamic mode on would
    # change unrelated writers' overwrite semantics
    prev_overwrite_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    n_processed = 0
    try:
        _run_groups(
            spark, ckpt, groups, pending, run_id, n_buckets,
            cfg, fail_buckets, spread, out_root,
        )
        n_processed = sum(len(g) for g in groups)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_overwrite_mode
        )

    return {
        "run_id": run_id,
        "buckets_processed": n_processed,
        # buckets with a prior 'done' checkpoint row — NOT n_buckets −
        # pending (that would count never-populated buckets as skipped)
        "buckets_skipped": n_done_prior,
    }


def _run_groups(
    spark, ckpt, groups, pending, run_id, n_buckets,
    cfg, fail_buckets, spread, out_root,
) -> None:
    import json

    for group in groups:
        gdf = pending.where(F.col("bucket").isin([int(b) for b in group]))
        if spread:
            gdf = spread_for_extract(
                gdf, spark.sparkContext.defaultParallelism, cfg
            )
        out = gdf.select("url", "warc_ts", "lang", "html", "bucket").mapInPandas(
            extract_stage_with_metrics(cfg, run_id, with_buckets=True),
            schema=EXTRACT_METRICS_BUCKET_SCHEMA,
        )
        # ONE action on the expensive Python-stage lineage: data rows
        # AND the per-partition metrics rows (bucket=-1 sentinel) land
        # in the same partitioned write. The per-bucket counters are
        # computed inside the stage, so there is no cache and no
        # second pass over executor-memory-sized text (the old shape
        # cached the full extract output to serve a groupBy).
        (
            out.drop("part_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out_root}/extracted")
        )
        # metrics read-back is a disk read of one tiny partition (the
        # next group's dynamic overwrite replaces it; read_extracted
        # filters bucket >= 0)
        metric_rows = (
            spark.read.parquet(f"{out_root}/extracted")
            .where(F.col("bucket") == -1)
            .select("extracted_text")
            .collect()
        )
        stats = [json.loads(r["extracted_text"]) for r in metric_rows]
        stats = [s for s in stats if s.get("run_id") == run_id]
        # group-granular wall: metrics are per task partition and a
        # partition mixes buckets under spread/grouping, so the
        # finest honest attribution is the GROUP's critical-path
        # wall, recorded on every bucket row of the group
        wall_ms = max((s["wall_ms"] for s in stats), default=0)
        agg: dict[int, list[int]] = {}
        for s in stats:
            for b, c in s.get("buckets", {}).items():
                acc = agg.setdefault(int(b), [0, 0, 0, 0])
                for i in range(4):
                    acc[i] += int(c[i])
        ckpt.mark_done(
            [
                {
                    "run_id": run_id,
                    "bucket": b,
                    "n_docs": c[0],
                    "n_ok": c[1],
                    "n_empty": c[2],
                    "n_error": c[3],
                    "wall_ms": wall_ms,
                }
                for b, c in sorted(agg.items())
            ],
            n_buckets,
        )
        if fail_buckets and set(group) & set(fail_buckets):
            raise RuntimeError(
                f"injected failure after group containing {sorted(set(group) & set(fail_buckets))}"
            )


def read_extracted(spark: SparkSession, out_root: str) -> DataFrame:
    # bucket=-1 is the metrics sentinel partition (last group's lineage
    # rows) — partition-pruned out here, never data
    return spark.read.parquet(f"{out_root}/extracted").where(F.col("bucket") >= 0)
