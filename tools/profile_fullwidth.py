"""Full-width (8→32) efficiency profile — VERDICT round-1 item 6.

Interleaved A/B of the extraction job at local[8] vs local[32] under
candidate limiter knobs, min-of-k per cell:

- arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch):
  64 / 256 / 1024 — granularity of Python-worker transfer;
- python worker reuse off (spark.python.worker.reuse=false) — tests
  whether worker churn, not compute, eats the width;
- task cpus 2 (spark.task.cpus=2 at local[32] → 16 concurrent tasks,
  each worker with twice the cache/bus headroom) — if memory-path
  saturation is the limiter, HALVING concurrency should recover most
  of the per-task speed (wall ≈ unchanged or better despite half the
  tasks); if the job were CPU-bound it would ~2× the wall.

Usage: python tools/profile_fullwidth.py  (uncontended host only —
timings on this VM are invalid with any other Spark session alive).
Prints one JSON line per cell + a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("PROFILE_DOCS", "8000"))
ROUNDS = int(os.environ.get("PROFILE_ROUNDS", "2"))


def ensure_pages() -> str:
    import bench

    return bench.ensure_bench_pages()


def time_cell(cores: int, conf: dict[str, str], path: str) -> float:
    from pyspark.sql import functions as F

    from ragflow_ocr_spark.spark.pipeline import extract
    from ragflow_ocr_spark.spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 4,
        extra_conf=conf,
    )
    pages = spark.read.parquet(path)
    extract(pages).count()  # warm
    t0 = time.monotonic()
    extract(pages).where(F.col("status").isNotNull()).count()
    wall = time.monotonic() - t0
    spark.stop()
    return wall


CELLS = {
    "baseline": {},
    "arrow64": {"spark.sql.execution.arrow.maxRecordsPerBatch": "64"},
    "arrow1024": {"spark.sql.execution.arrow.maxRecordsPerBatch": "1024"},
    "no_worker_reuse": {"spark.python.worker.reuse": "false"},
    "task_cpus2": {"spark.task.cpus": "2"},
}


def main() -> None:
    path = ensure_pages()
    walls: dict[tuple[str, int], list[float]] = {}
    for _ in range(ROUNDS):
        for name, conf in CELLS.items():
            for cores in (8, 32):
                if name == "task_cpus2" and cores == 8:
                    continue  # only meaningful at full width
                w = time_cell(cores, conf, path)
                walls.setdefault((name, cores), []).append(w)
                print(
                    json.dumps(
                        {"cell": name, "cores": cores, "wall_sec": round(w, 3)}
                    ),
                    flush=True,
                )
    summary = {}
    for name in CELLS:
        w8 = min(walls.get((name, 8), [float("nan")]))
        w32 = min(walls.get((name, 32), [float("nan")]))
        eff = (w8 / w32) / 4 if w8 == w8 and w32 == w32 else None
        summary[name] = {
            "wall8": round(w8, 3) if w8 == w8 else None,
            "wall32": round(w32, 3),
            "eff_8_32": round(eff, 3) if eff else None,
        }
    print(json.dumps({"n_docs": N_DOCS, "summary": summary}))


if __name__ == "__main__":
    main()
