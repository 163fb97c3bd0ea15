"""Checkpoint/resume plumbing — parquet-backed stand-in for the Iceberg
checkpoint table of the north rule.

Production target is an Iceberg table written via ``MERGE INTO`` (the
Iceberg runtime jar isn't shippable into this offline sandbox, so the
same idempotent semantics are implemented over parquet):

- work is keyed by a deterministic ``bucket = pmod(xxhash64(url), n)``;
- a completed bucket writes one status row per bucket + its output
  files under ``out/bucket=<b>/`` (dynamic partition overwrite —
  rewriting a bucket is idempotent, exactly like MERGE on the key);
- resume = LEFT ANTI JOIN of pending buckets against ``done`` rows
  (J3 in SURVEY.md §2.3) — broadcast, the checkpoint side is tiny.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = (
    "run_id string, bucket int, status string, n_docs long, n_ok long, "
    "n_empty long, n_error long, wall_ms long"
)


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.table_dir = os.path.join(root, "checkpoint")

    def done_buckets(self) -> DataFrame:
        """Buckets already completed (any run)."""
        if not os.path.isdir(self.table_dir) or not any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.table_dir)
            for f in fs
        ):
            return self.spark.createDataFrame([], "bucket int")
        return (
            self.spark.read.parquet(self.table_dir)
            .where(F.col("status") == "done")
            .select("bucket")
            .distinct()
        )

    def mark_done(self, rows: list[dict]) -> None:
        """Append completion rows (one per bucket). Parquet append of a
        handful of rows ⇔ the MERGE INTO of the production path."""
        if not rows:
            return
        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"],
                    int(r["bucket"]),
                    "done",
                    int(r.get("n_docs", 0)),
                    int(r.get("n_ok", 0)),
                    int(r.get("n_empty", 0)),
                    int(r.get("n_error", 0)),
                    int(r.get("wall_ms", 0)),
                )
                for r in rows
            ],
            CHECKPOINT_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.table_dir)

    @staticmethod
    def parse_metrics_rows(metric_rows: list) -> list[dict]:
        out = []
        for row in metric_rows:
            d = json.loads(row["extracted_text"])
            d["bucket"] = row["part_id"]
            out.append(d)
        return out
