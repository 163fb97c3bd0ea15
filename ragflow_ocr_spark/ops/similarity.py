"""Similarity search over the ``embeddings`` table (vec_id BIGINT,
embedding ARRAY<FLOAT>, label INT).

- brute-force cosine top-k: the correctness baseline. Query side is
  tiny → broadcast; the big side is scanned once, per-partition top-k
  via window. Dot products run JVM-side (zip_with + aggregate) in
  DOUBLE with left-to-right summation — bit-identical to the DuckDB
  oracle's ordered UNNEST sum.
- LSH-bucketed ANN and IVF-cell ANN: the scale paths — signatures /
  coarse cells bound the pair volume. Both are oracle-checked exactly:
  the oracle mirrors the bucketing/assignment algorithm itself (plane
  constants and centroid rule as literals), not the "true" neighbor
  set, so recall < 1 never causes a mismatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ragflow_ocr_spark.ops._tables import read_fanout
from pyspark.sql.window import Window

N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_fanout(spark, sf_dir, "embeddings")


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in DOUBLE, strictly left-to-right (matches the oracle's
    UNNEST-order SUM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for each query vector."""
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    cand = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", F.round(cosine(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


ORACLE_ANN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
), pairs AS (
  SELECT query_id, e.vec_id AS cand_id, qe, e.embedding AS ce
  FROM q, embeddings e WHERE e.vec_id != query_id
), dots AS (
  SELECT query_id, cand_id,
         SUM(qx * cx) AS dot, SUM(qx * qx) AS nq, SUM(cx * cx) AS nc
  FROM (
    SELECT query_id, cand_id,
           CAST(UNNEST(qe) AS DOUBLE) AS qx, CAST(UNNEST(ce) AS DOUBLE) AS cx
    FROM pairs)
  GROUP BY 1, 2
), scored AS (
  SELECT query_id, cand_id, ROUND(dot / (SQRT(nq) * SQRT(nc)), 6) AS cos
  FROM dots
)
SELECT query_id, cand_id, cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS rank
  FROM scored) WHERE rank <= {TOP_K}
"""


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ 0.3 — threshold sized
    to this corpus, whose max same-label cosine is ~0.47).

    Exact all-pairs formulation for the oracle check; the LSH variant
    below is the 100 TB path. The self-join is bounded by blocking on
    label (near-dups in this corpus share labels — verified blocking
    key), which keeps the join from going quadratic on the full table.
    """
    e = _emb(spark, sf_dir)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("ea"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lbl"),
        F.col("embedding").alias("eb"),
    )
    return (
        a.join(b, "lbl")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .where(F.col("cos") >= 0.3)
        .select("id_a", "id_b", "lbl", "cos")
    )


ORACLE_NEAR_DUP = """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS lbl,
         a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
), dots AS (
  SELECT id_a, id_b, lbl,
         SUM(ax * bx) AS dot, SUM(ax * ax) AS na, SUM(bx * bx) AS nb
  FROM (
    SELECT id_a, id_b, lbl,
           CAST(UNNEST(ea) AS DOUBLE) AS ax, CAST(UNNEST(eb) AS DOUBLE) AS bx
    FROM pairs)
  GROUP BY 1, 2, 3
)
SELECT id_a, id_b, lbl, cos FROM (
  SELECT id_a, id_b, lbl, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cos FROM dots)
WHERE cos >= 0.3
"""

N_LSH_BANDS = 4  # independent hash tables (recall knob)
PLANES_PER_BAND = 8  # r: bucket-granularity knob — scale with log2(n)
# Deterministic per-bucket member cap (smallest vec_ids kept): sign-LSH
# occupancy is data-dependent, and a corpus whose near-dup clusters are
# larger than any hash granularity (this synthetic one: 10 tight label
# clusters; raising r splits buckets only on noise dims) makes the
# in-bucket pair volume — and the J≥τ pair OUTPUT itself — quadratic in
# cluster size (measured: true cos≥0.25 pairs grow 44k → 26.8M for 10×
# rows). The cap is the standard production mitigation (cf. skewed
# approxSimilarityJoin buckets): Σ min(occ, CAP)² ≤ CAP·n keeps
# candidate work LINEAR, trading pair recall inside mega-clusters —
# where transitive grouping (dedup_clusters) is the right consumer
# anyway: connecting a cluster needs ~occ edges, not occ²/2.
MAX_BUCKET = 64
_DIM = 64


def _plane(p: int) -> list[float]:
    import math

    return [math.sin(p * 1000003 + j * 7919) for j in range(_DIM)]


def planes_per_band_for(n_vectors: int, target_bucket: int = 8) -> int:
    """Scale rule for r = planes per band: expected bucket occupancy is
    ~n/2^r per band (sign bits are near-balanced for mean-zero data),
    so r = ceil(log2(n / target_bucket)) keeps occupancy ≈ target and
    in-bucket pair volume ~n·target/2 per band — LINEAR in n, with the
    band count (not r) carrying recall. At n=10⁹ → r = 27; the
    corpus-sized constant the round-3 version used (a single 8-plane
    table) would put ~4M vectors per bucket and go quadratic. Floor =
    PLANES_PER_BAND so every corpus ≤ 2^(8+log2 target) vectors — all
    the oracle-checked test scales — uses exactly the r the static
    DuckDB oracle mirrors. Measured consequence of the fixed r (round
    4, sf1 rung): r=8 at 20k vectors read a 5.2× per-row cost ratio
    (206 s); adaptive r restores sub-linearity."""
    import math

    return max(PLANES_PER_BAND, math.ceil(math.log2(max(2, n_vectors) / target_bucket)))


_N_VECS_CACHE: dict[str, int] = {}


def _corpus_size(spark: SparkSession, sf_dir: str) -> int:
    """Embedding-corpus row count, one parquet-metadata probe per
    sf_dir per process (the count is footer metadata — no data scan —
    but the session/plan round-trip still cost ~0.1 s per invocation)."""
    n = _N_VECS_CACHE.get(sf_dir)
    if n is None:
        n = _N_VECS_CACHE[sf_dir] = spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).count()
    return n


def q_ann_lsh_bucketed(
    spark: SparkSession,
    sf_dir: str,
    n_bands: int = N_LSH_BANDS,
    planes_per_band: int | None = None,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Banded random-hyperplane LSH ANN — the scale path (B independent
    hash tables of r planes each, the minhash-banding shape).

    Per band b, signature = sign pattern of dot products against r
    fixed pseudo-random hyperplanes (deterministic: plane p component
    j = sin(p·1000003 + j·7919), materialized as double literals on
    BOTH engines — the oracle replicates the banding exactly, so the
    check is exact even though recall < 1 by construction). Candidate
    pairs share a bucket in ≥1 band; each is scored exactly once, with
    n_bands_hit reported. Recall for cosine s is 1−(1−(1−θ/π)^r)^B —
    the BAND COUNT carries recall, so r can grow with log2(n) to keep
    per-bucket occupancy bounded (``planes_per_band_for``) without
    collapsing recall the way a single deeper table would.

    Plan shape: one pass over the vectors computes all B signatures
    (map-side), one explode to (band, key) rows, a rank-cap inside
    each bucket (MAX_BUCKET smallest vec_ids — candidate work stays
    LINEAR even when the data's near-dup clusters exceed any hash
    granularity; see the MAX_BUCKET note), one groupBy collects the
    capped members, in-row pair expansion, then one (id_a, id_b)
    groupBy that dedupes across bands BEFORE the exact scoring —
    cosine runs once per candidate pair, not once per band hit. Carrying the embedding
    through the bucket shuffle costs B× vector traffic; the
    alternative (candidates by id + two joins back to the vector
    table) trades that for two corpus-wide shuffles — the carry wins
    at B=4. The sign decisions tolerate summation-order differences: a
    flip needs |dot| ≲ 1e-13, and dot magnitudes here are ~1e-1.

    ``planes_per_band`` defaults to the ``planes_per_band_for`` scale
    rule applied to the corpus row count (one parquet-metadata count —
    no data scan), so bucket occupancy stays bounded as the corpus
    grows. The static DuckDB oracle mirrors r = PLANES_PER_BAND, which
    the rule returns for every corpus up to 2^8·target vectors — all
    the sf0.001-sf0.1 scales the driver oracle-checks; larger corpora
    (the sf1 bench rung and beyond) raise r and trade per-band recall,
    which production restores by raising the band count alongside
    (recall 1−(1−(1−θ/π)^r)^B).
    """
    if planes_per_band is None:
        planes_per_band = planes_per_band_for(_corpus_size(spark, sf_dir))
        if planes_per_band > PLANES_PER_BAND:
            # The static driver oracle mirrors r = PLANES_PER_BAND; a
            # corpus big enough to raise r would red that row with no
            # obvious cause. Surface the regime switch loudly (the
            # adaptive regime itself is value-checked by
            # tests/test_lsh_adaptive_oracle.py with an r-parameterized
            # oracle).
            import warnings

            warnings.warn(
                f"ann_lsh_bucketed: adaptive r={planes_per_band} exceeds the "
                f"static-oracle r={PLANES_PER_BAND} for {sf_dir}; the driver "
                "oracle (if run on this corpus) would mismatch by design",
                stacklevel=2,
            )
    e = _emb(spark, sf_dir)

    # signature expressions as ONE SQL string: the Column-tree version
    # materialized B·r·64 F.lit plane components (2048 py4j calls at
    # the default shape — ~2.3 s of plan-build per run, measured).
    # Literals print as %.17e (exponent form parses as DOUBLE, never
    # DECIMAL, and 17 significant digits round-trip float64 exactly);
    # the bit fold Σ bit_p · 2^(r−1−p) is integer-identical to the
    # (((b0·2)+b1)·2+…) fold the tree version used, and the dot fold
    # is the same zip_with/aggregate left-to-right DOUBLE sum.
    def dot_sql(plane: list[float]) -> str:
        arr = ", ".join(f"{v:.17e}" for v in plane)
        return (
            f"aggregate(zip_with(embedding, array({arr}),"
            " (x, y) -> cast(x as double) * y), 0.0D, (acc, x) -> acc + x)"
        )

    band_structs = ", ".join(
        "struct({b} AS band, ({bits}) AS key)".format(
            b=b,
            bits=" + ".join(
                f"(cast({dot_sql(_plane(b * planes_per_band + p))} > 0.0D"
                f" as bigint) * {1 << (planes_per_band - 1 - p)})"
                for p in range(planes_per_band)
            ),
        )
        for b in range(n_bands)
    )
    bands = e.selectExpr(
        "vec_id", "embedding", f"explode(array({band_structs})) AS bb"
    ).select("vec_id", "embedding", "bb.band", "bb.key")
    # bucket member cap (see MAX_BUCKET), applied BEFORE the list
    # collect so a degenerate bucket never materializes as one giant
    # array: rank within (band, key) by vec_id (deterministic — the
    # smallest ids survive; oracle mirrors with the same ROW_NUMBER),
    # filter, then collect the ≤max_bucket survivors. The window and
    # the groupBy share the (band, key) partitioning, so the rank adds
    # a sort but no second exchange.
    w_bucket = Window.partitionBy("band", "key").orderBy("vec_id")
    kept = bands.withColumn("rn", F.row_number().over(w_bucket)).where(
        F.col("rn") <= max_bucket
    )
    buckets = (
        kept.groupBy("band", "key")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    cand = (
        buckets.select(F.col("band"), F.explode("ds").alias("a"), "ds")
        .select("band", "a", F.explode("ds").alias("b"))
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .groupBy(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bands_hit"),
            F.first(F.col("a.embedding")).alias("ea"),
            F.first(F.col("b.embedding")).alias("eb"),
        )
    )
    return (
        cand.withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .where(F.col("cos") >= 0.25)
        .select("id_a", "id_b", "n_bands_hit", "cos")
    )


def _oracle_lsh(planes_per_band: int = PLANES_PER_BAND) -> str:
    """DuckDB mirror of ``q_ann_lsh_bucketed``, parameterized by r so the
    adaptive-r regime (r > PLANES_PER_BAND on large corpora) is
    value-checkable too — tests/test_lsh_adaptive_oracle.py runs this at
    r = floor+1. The registry entry keeps the default r, which the
    scale rule returns for every driver-checked corpus."""

    def band_bits(b: int) -> str:
        planes = [
            "[" + ", ".join(repr(v) for v in _plane(b * planes_per_band + p)) + "]::DOUBLE[]"
            for p in range(planes_per_band)
        ]
        # bit weights mirror the Spark fold: sig = ((b0·2+b1)·2+…)
        return " + ".join(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {planes[p]}) > 0 "
            f"THEN {1 << (planes_per_band - 1 - p)} ELSE 0 END)"
            for p in range(planes_per_band)
        )

    sigs = "\nUNION ALL\n".join(
        f"SELECT vec_id, embedding, {b} AS band, CAST(({band_bits(b)}) AS BIGINT) AS key FROM embeddings"
        for b in range(N_LSH_BANDS)
    )
    return f"""
WITH sigs AS (
  {sigs}
), kept AS (
  SELECT vec_id, embedding, band, key FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY vec_id)
              AS rn
    FROM sigs) WHERE rn <= {MAX_BUCKET}
), cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS n_bands_hit,
         ANY_VALUE(a.embedding) AS ea, ANY_VALUE(b.embedding) AS eb
  FROM kept a JOIN kept b
    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
  GROUP BY 1, 2
), dots AS (
  SELECT id_a, id_b, n_bands_hit,
         SUM(ax * bx) AS dot, SUM(ax * ax) AS na, SUM(bx * bx) AS nb
  FROM (
    SELECT id_a, id_b, n_bands_hit,
           CAST(UNNEST(ea) AS DOUBLE) AS ax, CAST(UNNEST(eb) AS DOUBLE) AS bx
    FROM cand)
  GROUP BY 1, 2, 3
)
SELECT id_a, id_b, n_bands_hit, cos FROM (
  SELECT id_a, id_b, n_bands_hit, ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cos
  FROM dots)
WHERE cos >= 0.25
"""


K_CELLS = 16  # IVF coarse cells = the first K corpus vectors


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest coarse
    centroid (cells = the first K_CELLS corpus vectors — deterministic
    and oracle-mirrorable), then score queries exactly against their
    own cell only (nprobe=1).

    Scale shape: the centroid table is tiny → broadcast; assignment is
    a broadcast cross join + min(struct(dist, cid)) groupBy (map-side
    combine); the candidate join shuffles on cell id — ~1/K of the
    brute-force pair volume. Ties in the cell argmin break on cid via
    struct ordering (bit-identical rule in the oracle's ROW_NUMBER).
    """
    e = _emb(spark, sf_dir)
    cents = e.where(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    # d = |c|² − 2·v·c  (|v|² is constant per vector → argmin-invariant)
    d = (
        e.crossJoin(F.broadcast(cents))
        .withColumn(
            "dist",
            _dot(F.col("cemb"), F.col("cemb"))
            - 2.0 * _dot(F.col("embedding"), F.col("cemb")),
        )
    )
    asg = d.groupBy("vec_id").agg(
        F.min(F.struct(F.col("dist"), F.col("cid"))).alias("m"),
        # every row of a vec_id group carries the same embedding
        F.first("embedding").alias("embedding"),
    ).select("vec_id", F.col("m.cid").alias("cell"), "embedding")
    q = asg.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cell"), F.col("embedding").alias("qe")
    )
    cand = asg.select(
        F.col("vec_id").alias("cand_id"), F.col("cell"), F.col("embedding").alias("ce")
    )
    scored = (
        F.broadcast(q)
        .join(cand, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", F.round(cosine(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cell", "cos", "rank")
    )


ORACLE_IVF = f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < {K_CELLS}
), dists AS (
  SELECT e.vec_id, c.cid,
         list_dot_product(c.cemb::DOUBLE[], c.cemb::DOUBLE[])
         - 2 * list_dot_product(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) AS dist
  FROM embeddings e, cents c
), asg AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dists) WHERE rn = 1
), q AS (
  SELECT a.vec_id AS query_id, a.cell, e.embedding AS qe
  FROM asg a JOIN embeddings e USING (vec_id) WHERE a.vec_id < {N_QUERIES}
), cand AS (
  SELECT a.vec_id AS cand_id, a.cell, e.embedding AS ce
  FROM asg a JOIN embeddings e USING (vec_id)
), pairs AS (
  SELECT query_id, cand_id, q.cell, qe, ce
  FROM q JOIN cand USING (cell) WHERE cand_id != query_id
), dots AS (
  SELECT query_id, cand_id, cell,
         SUM(qx * cx) AS dot, SUM(qx * qx) AS nq, SUM(cx * cx) AS nc
  FROM (
    SELECT query_id, cand_id, cell,
           CAST(UNNEST(qe) AS DOUBLE) AS qx, CAST(UNNEST(ce) AS DOUBLE) AS cx
    FROM pairs)
  GROUP BY 1, 2, 3
), scored AS (
  SELECT query_id, cand_id, cell, ROUND(dot / (SQRT(nq) * SQRT(nc)), 6) AS cos
  FROM dots
)
SELECT query_id, cand_id, cell, cos, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS rank
  FROM scored) WHERE rank <= {TOP_K}
"""


QUERIES = {
    "ann_cosine_topk": (q_ann_cosine_topk, ORACLE_ANN),
    "embed_near_dup": (q_embed_near_dup, ORACLE_NEAR_DUP),
    "ann_lsh_bucketed": (q_ann_lsh_bucketed, _oracle_lsh()),
    "ann_ivf": (q_ann_ivf, ORACLE_IVF),
}
