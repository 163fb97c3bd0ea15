"""URL canonicalization operators — the crawl-curation idioms that run
before any content dedup at 10^12-document scale: canonicalize messy
URLs (case, www, tracking params, fragments, trailing slash) and
profile the corpus per domain.

The sf test tables carry no URL column (the pages table does, per
``input_hint``), so both engines synthesize the SAME deterministic
messy URL from ``documents`` columns first — the synthesis is part of
the oracle-checked expression, standing in for ``pages.url``. The
``doc_id % 100`` path slug forces real canonical collisions so the
dedup has non-trivial groups.

All string surgery is regexp_replace/regexp_extract with patterns in
the common Java-regex/RE2 subset, entirely JVM-side (whole-stage
codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ragflow_ocr_spark.ops._tables import read_fanout

_RAW_URL_SQL = """
    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END
    || source || '.example.com/article/' || CAST(doc_id % 100 AS VARCHAR)
    || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END
"""


def _raw_url() -> Column:
    return F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://www.")
        ),
        F.col("source"),
        F.lit(".example.com/article/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&utm_campaign=x")
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def _canonicalize(url: Column) -> Column:
    """lowercase → strip #fragment → strip utm-only query → strip
    trailing slash → strip www. — the standard canonicalization chain,
    each step one regexp, identical pattern in the SQL oracle."""
    c = F.lower(url)
    c = F.regexp_replace(c, "#.*$", "")
    c = F.regexp_replace(c, "\\?utm[^#]*$", "")
    c = F.regexp_replace(c, "/$", "")
    c = F.regexp_replace(c, "^(https?://)www\\.", "$1")
    return c


_CANON_SQL = r"""
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(LOWER({raw}), '#.*$', ''),
        '\?utm[^#]*$', ''),
      '/$', ''),
    '^(https?://)www\.', '\1')
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_fanout(spark, sf_dir, "documents")


def q_dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup assignment: canonicalize, group, keep min
    doc_id per canonical url. One hash-groupBy on the canonical string
    (map-side combine); at crawl scale this is the first, cheapest
    dedup pass — it needs no content bytes at all, so it runs on the
    url column alone with full column pruning."""
    d = _docs(spark, sf_dir)
    return (
        d.withColumn("canonical_url", _canonicalize(_raw_url()))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


ORACLE_URL_DEDUP = f"""
WITH canon AS (
  SELECT doc_id, source,
         {_CANON_SQL.format(raw=f'({_RAW_URL_SQL})')} AS canonical_url
  FROM documents
)
SELECT canonical_url, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size,
       COUNT(DISTINCT source) AS n_sources
FROM canon GROUP BY canonical_url
"""


def q_domain_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus profile: host extracted from the canonical
    url, then docs / distinct langs / char mass per host — the
    monitoring rollup a crawl pipeline emits per ingest. regexp_extract
    of the authority + one groupBy."""
    d = _docs(spark, sf_dir)
    host = F.regexp_extract(_canonicalize(_raw_url()), "^https?://([^/]+)", 1)
    return (
        d.withColumn("host", host)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
    )


ORACLE_DOMAIN = f"""
WITH canon AS (
  SELECT doc_id, lang, n_chars,
         regexp_extract({_CANON_SQL.format(raw=f'({_RAW_URL_SQL})')},
                        '^https?://([^/]+)', 1) AS host
  FROM documents
)
SELECT host, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars
FROM canon GROUP BY host
"""


# ------------------------------------------------ deterministic splits
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based corpus partitioning: train/val/test
    assignment (80/10/10) plus an independent stratified 10% sample
    flag, rolled up per (source, split).

    At 10^12 docs, seeded Bernoulli sampling is NOT reproducible across
    engines/retries (RNG stream depends on partitioning); the curation
    idiom is hash-mod bucketing — md5(doc_id) % 100 — which is
    engine-portable, stable under repartition/recompute, and exactly
    oracle-checkable. The sample flag hashes a salted key so sample
    membership is independent of split membership. Pure JVM expressions,
    map-side combine on the rollup."""
    d = _docs(spark, sf_dir)
    key = F.col("doc_id").cast("string")
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 100
    )
    sbucket = (
        F.conv(F.substring(F.md5(F.concat(key, F.lit("#s"))), 1, 4), 16, 10)
        .cast("long") % 10
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("split", split)
        .withColumn("in_sample", (sbucket == 0).cast("int"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("in_sample").cast("long").alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


ORACLE_SAMPLE_SPLIT = """
WITH b AS (
  SELECT source, n_chars,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS UBIGINT) AS BIGINT) % 100 AS bucket,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#s'), 1, 4)) AS UBIGINT) AS BIGINT) % 10 AS sbucket
  FROM documents
)
SELECT source,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN sbucket = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1, 2
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum quotas: the top-5 documents of every
    (lang, source) cell ordered by a salted hash — the curation idiom
    for building evaluation slices with GUARANTEED per-cell counts
    (Bernoulli/fraction sampling only hits quotas in expectation, and
    its RNG stream is partitioning-dependent; the hash order is
    engine-portable and retry-stable).

    Scale shape: one shuffle on the stratum key; the rank's top-k is
    pushed below the shuffle as WindowGroupLimit (plan-asserted), so
    each map task forwards at most k rows per stratum it sees — the
    shuffle carries O(cells · k · tasks), not the corpus. Tie-break
    chain md5 → doc_id keeps row_number deterministic (oracle
    convention)."""
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "lang", "source", F.col("rn").cast("int").alias("rn"))
    )


ORACLE_STRATIFIED = """
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= 5
"""


QUERIES = {
    "dedup_url_canonical": (q_dedup_url_canonical, ORACLE_URL_DEDUP),
    "domain_profile": (q_domain_profile, ORACLE_DOMAIN),
    "sample_split": (q_sample_split, ORACLE_SAMPLE_SPLIT),
    "stratified_sample": (q_stratified_sample, ORACLE_STRATIFIED),
}
