"""Relational + training-data operators over plain DataFrames.

Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is
the DuckDB-equivalent ANSI SQL (or None for non-SQL-expressible ops —
the driver then records a weaker rows-only check).

Cross-engine determinism rules used throughout:
- hashes: md5 only (identical hex in Spark and DuckDB); never
  xxhash64/hash() in oracle-checked outputs;
- floats: computed in DOUBLE with identical operation order in both
  engines, then ROUND(…, k) in both;
- every aggregate/computed column aliased identically on both sides;
- ties in any top-k broken by a unique key.
"""

from __future__ import annotations

from ragflow_ocr_spark.ops import (
    curation,
    dedup,
    multimodal,
    relational,
    relational_ext,
    similarity,
    textstats,
    weburl,
)


def all_queries():
    out = {}
    for mod in (
        relational,
        relational_ext,
        dedup,
        similarity,
        textstats,
        multimodal,
        weburl,
        curation,
    ):
        for k, v in mod.QUERIES.items():
            assert k not in out, f"duplicate query name {k}"
            out[k] = v
    return out
