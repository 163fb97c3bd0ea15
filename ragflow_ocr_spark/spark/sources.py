"""Sources beyond the primary pages table (SURVEY.md §2.1 S1/S2).

``read_image_dir`` is the loose-file ingestion path: Spark's built-in
``binaryFile`` source with a glob filter (the reference's directory
scan, ``/root/reference/examples/batch_processing.py:28-38``), mapped
into the pages schema so the rest of the pipeline is source-agnostic.
At scale the primary source is the Iceberg/parquet pages table; this
path exists for ad-hoc ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

IMAGE_GLOB = (
    "*.{png,PNG,jpg,JPG,jpeg,JPEG,bmp,BMP,tif,TIF,tiff,TIFF}"
)  # reference glob set (examples/batch_processing.py:28) + common casings


def read_image_dir(
    spark: SparkSession, path: str, glob: str = IMAGE_GLOB
) -> DataFrame:
    """directory of image files → pages(url, warc_ts, html, text, lang)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return df.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
