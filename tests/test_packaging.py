"""spark-submit --py-files packaging smoke (north-rule deployment
shape): the package must resolve purely from the zip in a clean cwd."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark
import pytest

SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_with_py_files_zip(tmp_path):
    zip_base = tmp_path / "ragflow_ocr_spark"
    shutil.make_archive(
        str(zip_base), "zip", root_dir=REPO, base_dir="ragflow_ocr_spark"
    )
    shutil.copy(
        os.path.join(REPO, "ragflow_ocr_spark", "jobs", "extract.py"),
        tmp_path / "extract_job.py",
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # package must come from the zip alone
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", str(zip_base) + ".zip",
            "extract_job.py",
            "--synthesize", "120",
            "--output", "job_out",
            "--buckets", "6",
            "--group-size", "3",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=280,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["buckets_processed"] == 6
    out = tmp_path / "job_out" / "extracted"
    assert out.is_dir() and any(out.rglob("*.parquet"))
