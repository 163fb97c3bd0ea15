"""Corpus-curation operators: exact substring dedup (span removal)
and deterministic mixture resampling — the two curation steps a
training-data pipeline runs AFTER document-level dedup and quality
filtering (reference scope extension per SURVEY.md §2's training-data
mandate; the reference itself has no corpus-level operators).

Scale notes:
- ``dedup_substring`` is the distributed k-gram-anchor formulation of
  exact substring deduplication ("Deduplicating Training Data Makes
  Language Models Better", Lee et al. 2022): the paper builds one
  suffix array on one large host; at 100 TB the portable equivalent is
  fixed-k token windows — adjacent duplicated windows merge into
  maximal islands, so any duplicated run of ≥ k tokens is removed
  except its first corpus occurrence. Plan shape: one map-side gram
  explode, ONE uniform-key shuffle (md5 gram hash — no skew by
  construction), a per-doc window for island merging (key = doc_id,
  bounded by the max doc token count), and one doc_id join back.
  Nothing is all-pairs and nothing collects to the driver.
- ``mixture_sample`` is deterministic domain-mixture resampling (the
  data-mixing step that turns curated pools into a training mix with
  per-source weights, cf. The Pile / DoReMi-style mixture tables):
  integer part of the weight replicates rows map-side (explode),
  fractional part is an md5-bucket Bernoulli — portable, retry-stable,
  partitioning-independent, unlike seeded RNG Sample. The whole
  operator is a projection + explode: ZERO shuffles beyond the
  documented test-corpus fan-out (read_fanout), so it scales as a pure
  map over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ragflow_ocr_spark.ops._tables import read_fanout

# Substring-dedup window: any duplicated token run of >= K tokens is
# cut (all occurrences after the corpus-first one). Lee et al. use 50
# BPE tokens on web corpora; the synthetic docs are 10-99 whitespace
# tokens, so K=8 keeps the operator's merge/keeper logic exercised at
# every test scale while the constant stays a config, not a semantic.
SUBSTR_K = 8

# Mixture weights in basis points (weight × 10⁴) so the integer /
# fractional split is exact integer arithmetic on BOTH engines — a
# float weight would make `floor(w)` and `frac(w)` rounding-sensitive.
MIX_BP = {"en": 23000, "es": 15000, "fr": 10000, "de": 4000}
MIX_DEFAULT_BP = 10000


# -------------------------------------------------- substring dedup
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup: remove every duplicated K-token window
    except its first corpus occurrence (keeper = min (doc_id, pos)),
    merging overlapping windows into maximal islands before cutting.

    Semantics (oracle-identical): tokenize on single spaces; for each
    position p emit the K-token gram; a gram occurring more than once
    corpus-wide marks every NON-keeper occurrence's span [p, p+K) for
    removal; per doc, overlapping/adjacent spans merge (gaps-and-
    islands over the position-sorted spans); the kept text is the
    original tokens minus island positions, order preserved. Docs
    shorter than K tokens pass through untouched.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    k = SUBSTR_K
    toks = F.split(F.col("text"), " ")

    # (doc_id, p, gram-hash, keeper-key) for every K-window. md5 keeps
    # the shuffle key 16 bytes and uniformly distributed; the keeper
    # key packs (doc_id, p) into one orderable int (docs are far below
    # 10^6 tokens — guarded in the where(); int64 headroom holds
    # through doc_id ≈ 9.2×10^12, i.e. the 10^12-doc target scale —
    # past that, switch the agg to min(struct(doc_id, p))).
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda p: F.struct(
            p.alias("p"),
            F.md5(F.concat_ws(" ", F.slice(toks, p + 1, k))).alias("g"),
        ),
    )
    occ = (
        d.where((F.size(toks) >= k) & (F.size(toks) < 1000000))
        .select("doc_id", F.explode(grams).alias("s"))
        .select(
            "doc_id",
            F.col("s.p").cast("long").alias("p"),
            F.col("s.g").alias("g"),
        )
        .withColumn("kk", F.col("doc_id") * 1000000 + F.col("p"))
    )

    # the one corpus-wide shuffle: gram → (count, first occurrence)
    kg = occ.groupBy("g").agg(
        F.min("kk").alias("keep_kk"), F.count(F.lit(1)).alias("c")
    )
    spans = (
        occ.join(kg.where(F.col("c") > 1), "g")
        .where(F.col("kk") != F.col("keep_kk"))
        .select("doc_id", "p")
    )

    # gaps-and-islands per doc: spans all have length K, so a span
    # starts a new island iff p >= (max previous p) + K
    w = Window.partitionBy("doc_id").orderBy("p")
    pm = F.max("p").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "f", F.when(pm.isNull() | (F.col("p") >= pm + k), 1).otherwise(0)
    )
    islands = (
        flagged.withColumn(
            "isl",
            F.sum("f").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("doc_id", "isl")
        .agg(F.min("p").alias("s"), (F.max("p") + k).alias("e"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias(
                "islands"
            )
        )
    )

    # cut islands out in-row (no token explode): filter-with-index
    out = d.join(islands, "doc_id", "left")
    kept = F.when(
        F.col("islands").isNull(), toks
    ).otherwise(
        F.filter(
            toks,
            lambda t, i: ~F.exists(
                F.col("islands"),
                lambda sp: (i >= sp["s"]) & (i < sp["e"]),
            ),
        )
    )
    return out.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size(toks) - F.size(kept)).cast("int").alias("n_removed"),
        F.coalesce(F.size("islands"), F.lit(0)).cast("int").alias("n_spans"),
    )


ORACLE_SUBSTRING = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
         md5(array_to_string(t[i:i+{SUBSTR_K - 1}], ' ')) AS g,
         doc_id * 1000000 + (i - 1) AS kk
  FROM toks, unnest(generate_series(1, len(t) - {SUBSTR_K} + 1)) AS u(i)
  WHERE len(t) >= {SUBSTR_K} AND len(t) < 1000000
),
kg AS (
  SELECT g, MIN(kk) AS keep_kk, COUNT(*) AS c FROM occ GROUP BY 1
),
sp AS (
  SELECT occ.doc_id, occ.p FROM occ JOIN kg USING (g)
  WHERE kg.c > 1 AND occ.kk <> kg.keep_kk
),
pm AS (
  SELECT doc_id, p,
         MAX(p) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_p
  FROM sp
),
fl AS (
  SELECT doc_id, p,
         CASE WHEN prev_p IS NULL OR p >= prev_p + {SUBSTR_K}
              THEN 1 ELSE 0 END AS f
  FROM pm
),
il AS (
  SELECT doc_id, p,
         SUM(f) OVER (PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM fl
),
islands AS (
  SELECT doc_id, MIN(p) AS s, MAX(p) + {SUBSTR_K} AS e
  FROM il GROUP BY doc_id, isl
),
tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS ti, t[i] AS w, len(t) AS n
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.ti, tok.w
  FROM tok LEFT JOIN islands
    ON tok.doc_id = islands.doc_id
   AND tok.ti >= islands.s AND tok.ti < islands.e
  WHERE islands.doc_id IS NULL
),
agg AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY ti) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY 1
),
nisl AS (
  SELECT doc_id, COUNT(*) AS n_spans FROM islands GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(agg.clean_text, '') AS clean_text,
       CAST(len(string_split(d.text, ' ')) - COALESCE(agg.n_kept, 0)
            AS INT) AS n_removed,
       CAST(COALESCE(nisl.n_spans, 0) AS INT) AS n_spans
FROM documents d
LEFT JOIN agg ON d.doc_id = agg.doc_id
LEFT JOIN nisl ON d.doc_id = nisl.doc_id
"""


# ------------------------------------------------- mixture resample
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture resampling: each doc is emitted
    floor(weight) times, plus one more iff its md5 mixture bucket
    falls under the fractional part — so the expected copy count is
    exactly the weight per lang, with membership stable across
    engines, retries, and repartitions (seeded RNG Sample is none of
    those; same rationale as ``sample_split``).

    Output is the resampled row set (doc_id, lang, source, copy_idx):
    weight < 1 downsamples (copies may be 0 → row dropped), weight > 1
    upsamples with distinct copy_idx so downstream shuffles can salt
    on it. Pure projection + map-side explode: no shuffle at any
    scale.
    """
    d = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    bp = F.lit(MIX_DEFAULT_BP)
    for lang, v in MIX_BP.items():
        bp = F.when(F.col("lang") == lang, F.lit(v)).otherwise(bp)
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#mix"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    copies = (
        F.floor(bp / 10000).cast("int")
        + (bucket < bp % 10000).cast("int")
    )
    # sequence(1, 0) would yield a DESCENDING [1, 0] in Spark — build
    # sequence(1, max(copies, 1)) then slice to `copies` elements so
    # copies == 0 becomes the empty array (row dropped by explode)
    idx = F.slice(
        F.sequence(F.lit(1), F.greatest(copies, F.lit(1))), 1, copies
    )
    return d.select(
        "doc_id", "lang", "source", F.explode(idx).alias("copy_idx")
    )


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN '{lang}' THEN {v}" for lang, v in MIX_BP.items()
    )
    return f"CASE lang {arms} ELSE {MIX_DEFAULT_BP} END"


ORACLE_MIXTURE = f"""
WITH w AS (
  SELECT doc_id, lang, source,
         {_mix_case_sql()} AS bp,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'),
              1, 4)) AS UBIGINT) AS BIGINT) % 10000 AS bucket
  FROM documents
),
c AS (
  SELECT doc_id, lang, source,
         bp // 10000
           + CASE WHEN bucket < bp % 10000 THEN 1 ELSE 0 END AS copies
  FROM w
)
SELECT doc_id, lang, source,
       CAST(unnest(generate_series(1, copies)) AS INT) AS copy_idx
FROM c
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_fanout(spark, sf_dir, "documents")


QUERIES = {
    "dedup_substring": (q_dedup_substring, ORACLE_SUBSTRING),
    "mixture_sample": (q_mixture_sample, ORACLE_MIXTURE),
}
