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

The exact production DDL / MERGE INTO / resume SQL this stands in for
is emitted by ``spark/iceberg_sql.py`` (golden-pinned in
``tests/test_iceberg_sql.py`` so the two can't drift).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = (
    "run_id string, bucket int, n_buckets int, status string, n_docs long, "
    "n_ok long, n_empty long, n_error long, wall_ms long"
)


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.table_dir = os.path.join(root, "checkpoint")

    def _table(self) -> DataFrame | None:
        if not os.path.isdir(self.table_dir) or not any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.table_dir)
            for f in fs
        ):
            return None
        return self.spark.read.parquet(self.table_dir)

    def done_buckets(self, n_buckets: int) -> DataFrame:
        """Buckets already completed (any run) under the SAME bucket
        numbering. Bucket ids are only meaningful relative to
        ``n_buckets``: resuming a root written with a different count
        would anti-join the WRONG url sets out (silently losing rows)
        and mix incompatibly-numbered ``extracted/bucket=`` partitions
        — so a mismatch is refused outright."""
        t = self._table()
        if t is None:
            return self.spark.createDataFrame([], "bucket int")
        if "n_buckets" not in t.columns:
            raise ValueError(
                f"checkpoint at {self.table_dir} predates the n_buckets "
                "schema (written by an older build); resume must use a "
                "fresh output root"
            )
        seen = [r["n_buckets"] for r in t.select("n_buckets").distinct().collect()]
        wrong = [n for n in seen if n != n_buckets]
        if wrong:
            raise ValueError(
                f"checkpoint at {self.table_dir} was written with "
                f"n_buckets={sorted(set(wrong))}; resume must use the same "
                f"value (got {n_buckets}) or a fresh output root"
            )
        return (
            t.where(F.col("status") == "done")
            .select("bucket")
            .distinct()
        )

    def mark_done(self, rows: list[dict], n_buckets: int) -> None:
        """Append completion rows (one per bucket). Parquet append of a
        handful of rows ⇔ the MERGE INTO of the production path."""
        if not rows:
            return
        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"],
                    int(r["bucket"]),
                    int(n_buckets),
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

