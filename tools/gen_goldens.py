"""(Re)generate the committed byte-goldens for the pipeline regression
test. Run consciously after any intended kernel behavior change:
    python tools/gen_goldens.py
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from ragflow_ocr_spark.spark import synth  # noqa: E402
from ragflow_ocr_spark.spark.pipeline import extract  # noqa: E402
from ragflow_ocr_spark.spark.session import get_spark  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "extract_150.json.gz")


def main() -> None:
    spark = get_spark(app_name="gen-goldens", master="local[4]")
    pages = synth.pages_df(spark, 150, partitions=4)
    rows = extract(pages).collect()
    golden = {
        r["url"]: [r["extracted_text"], r["n_blocks"], r["status"]] for r in rows
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt") as f:
        json.dump(golden, f, sort_keys=True)
    print(f"wrote {len(golden)} goldens to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
