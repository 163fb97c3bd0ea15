"""Deduplication operators over the ``documents`` table — the
training-data-pipeline core set: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale notes:
- exact dedup is one hash-groupBy (map-side combine does the work);
- n-gram Jaccard is the *verification* primitive — quadratic if used
  alone, so at scale it only runs on LSH candidate pairs;
- MinHash+LSH is the scale path: shingles → K minhashes → B bands →
  bucket-join. The band bucket-join shuffles (band_id, band_hash)
  which is uniformly distributed — no skew. Candidates are then
  verified with exact Jaccard, so the output is exact (LSH recall at
  J≥0.5 with 64 bands × 2 rows ≈ 1-1e-8) and the DuckDB oracle can be
  the exact-Jaccard query;
- SimHash has a ``hash_family`` switch: xxhash64 is the production
  default (one JVM call per token; registered rows-only as
  ``dedup_simhash_fast``), while the md5-derived 60-bit family
  (identical hex in both engines) is kept for the oracle-checked
  ``dedup_simhash`` entry. Same plan shape either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_ocr_spark.ops._tables import read_fanout


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_fanout(spark, sf_dir, "documents")


# ------------------------------------------------------------ exact dedup
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by md5(text); keeper = min doc_id.
    Output includes singletons (group_size 1) so the result is a full
    dedup assignment, not only the dup report."""
    d = _docs(spark, sf_dir)
    h = F.md5(F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8"))
    return (
        d.withColumn("fp", h)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


ORACLE_EXACT = """
SELECT md5(COALESCE(text, '')) AS fp,
       MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
FROM documents GROUP BY 1
"""


# ------------------------------------------------- word-3-gram shingles
def _shingles_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle table, deliberately NOT ``.cache()``d even where a
    query scans it more than once: the explode is cheap and fuses into
    the downstream aggregates under whole-stage codegen, while a cached
    copy (measured ~2-4× slower end-to-end at sf0.1) costs MORE —
    materialization breaks the codegen fusion, stores ~10× the source
    bytes, and its InMemoryTableScan is slower than recomputing
    split+explode from the parquet scan. At 100 TB the same holds:
    recompute beats cache for map-only lineage; only shuffle outputs
    are worth materializing."""
    return _shingles(_docs(spark, sf_dir))


def _shingles(d: DataFrame) -> DataFrame:
    """doc_id → exploded distinct word-3-gram shingles."""
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), n - 3)
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            F.element_at(words, i + 1),
            F.element_at(words, i + 2),
            F.element_at(words, i + 3),
        ),
    )
    return (
        d.where(n >= 3)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard pairs with J ≥ 0.5.

    Relational formulation (no quadratic cross join): shingle-level
    self-join counts the intersection; |A∪B| = |A|+|B|−|A∩B|. The
    shingle join key is high-cardinality → well-distributed shuffle.
    """
    sh = _shingles_df(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    j = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    return j


ORACLE_NGRAM = """
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct([
           w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN RANGE(1, len(w) - 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_common, jaccard FROM (
  SELECT id_a, id_b, n_common,
         ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b)
WHERE jaccard >= 0.5
"""
# the oracle thresholds the ROUNDED value because the Spark side does —
# raw-ratio filtering would diverge for J in [0.4999995, 0.5) on
# million-shingle documents


# ------------------------------------------------------------ MinHash+LSH
N_HASHES = 128
N_BANDS = 64  # 2 rows/band → recall ≈ 1 − (1−J²)^64; @J=0.5 ≈ 1−1e-8


def _minhash_bands(sh: DataFrame) -> DataFrame:
    """shingles → (doc_id, band, bsig) LSH band table.

    K permutation-free minhashes as K plain agg columns — each min()
    gets map-side partial aggregation and whole-stage codegen; the
    array+element_at formulation is ~40× slower (measured). Hash
    family: one string hash per shingle, then K fixed-width re-hashes
    h_i = xxhash64(h1, seed=i). Hashing the 8-byte long is far cheaper
    than re-hashing the variable-length shingle K times, and stays
    fully independent across i (an additive h1 + i·h2 family was tried
    and REJECTED: without modular wrap the argmin is dominated by h1,
    every minhash picks the same shingle, and LSH recall collapses —
    observed as missing candidate pairs). Candidates are always
    exact-verified downstream, so the hash family can only affect
    recall, never output correctness of surfaced pairs.

    Expressions are built as SQL strings (selectExpr/F.expr), not
    nested Column trees: the 128-agg + 64-band construction was ~1.4 s
    of py4j plan-build per call (measured round 4), charged to every
    minhash-based query (lsh, incremental, clusters)."""
    hashed = sh.selectExpr("doc_id", "xxhash64(shingle) AS h1")
    sig = hashed.groupBy("doc_id").agg(
        *[F.expr(f"min(xxhash64(h1, {i})) AS h{i}") for i in range(N_HASHES)]
    )
    rows_per_band = N_HASHES // N_BANDS
    structs = ", ".join(
        "struct({b} AS band, xxhash64({cols}) AS bsig)".format(
            b=b,
            cols=", ".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(N_BANDS)
    )
    return sig.selectExpr(
        "doc_id", f"explode(array({structs})) AS bb"
    ).selectExpr("doc_id", "bb.band AS band", "bb.bsig AS bsig")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate generation + exact-Jaccard verification.

    Same output contract as q_dedup_ngram_jaccard (J ≥ 0.5 pairs) but
    near-linear: signatures are one groupBy over shingles; banding
    buckets are joined on (band, band_signature). The oracle is the
    exact-Jaccard SQL — valid because verified candidates are exact
    and band recall at the threshold is ≈1 (miss prob < 1e-8).
    """
    sh = _shingles_df(spark, sf_dir)
    bands = _minhash_bands(sh)  # see helper for hash-family + expr notes
    # single-pass band buckets (same trick as q_dedup_simhash): a
    # (band,bsig) self-join would evaluate the whole 128-hash
    # signature lineage once per join side; one groupBy +
    # collect_list + in-row pair expansion computes it once. Buckets
    # are tiny (near-dup groups), so the collected lists stay small.
    buckets = (
        bands.groupBy("band", "bsig")
        .agg(F.collect_list("doc_id").alias("ds"))
        .where(F.size("ds") > 1)
    )
    cand = (
        buckets.select(F.explode("ds").alias("id_a"), "ds")
        .select("id_a", F.explode("ds").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()  # the same pair can collide in several bands
    )
    # exact verification of candidates only. The verify joins scan the
    # FULL shingle table (3 fused map-only passes) rather than
    # semi-joining the docs down to candidate ids first: the restricted
    # shape (localCheckpoint(cand) + left_semi docs + re-shingle
    # candidates, as q_dedup_incremental does) was tried and REJECTED
    # here — measured 14.3 s vs 16.7 s at the sf1 rung (interleaved
    # min-of-3): for a self-join dedup the candidate-doc set is a large
    # fraction of the corpus whenever duplication is non-trivial, so
    # the checkpoint barrier + distinct + semi-join cost more than the
    # shuffle-free fused explode passes they replace. The asymmetric
    # variant (tiny new-slice candidates) is where the restriction
    # wins, and q_dedup_incremental keeps it.
    sh_a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# ---------------------------------------------------------------- SimHash
SIMHASH_BITS = 60  # 15 hex chars of md5 → portable across Spark & DuckDB
_LANES = 3  # vote lanes packed per 64-bit agg column
_LANE_BITS = 21  # lane width → per-doc token budget 2^21 (runtime-guarded)


def _token_hash_sql(hash_family: str) -> str:
    """60-bit token hash SQL expression over column ``tok``.

    - ``xxhash64`` (production default): one cheap JVM hash, masked to
      60 bits. NOT DuckDB-reproducible — rows-only checked.
    - ``md5``: 15 hex chars → conv → long; three string ops per token
      but byte-identical in DuckDB, so the oracle run uses it.
    """
    if hash_family == "xxhash64":
        return f"xxhash64(tok) & {(1 << SIMHASH_BITS) - 1}"
    if hash_family == "md5":
        return (
            "cast(conv(substring(md5(encode(tok, 'UTF-8')), 1, 15), 16, 10)"
            " as bigint)"
        )
    raise ValueError(f"unknown simhash hash_family: {hash_family!r}")


def simhash_values(d: DataFrame, hash_family: str = "xxhash64") -> DataFrame:
    """doc_id → 60-bit simhash over whitespace tokens (packed vote agg).

    Exposed separately from q_dedup_simhash so the packed-lane
    aggregation can be pinned against a naive per-bit reference.

    Packed vote aggregation: the per-bit signed vote sum(±c) equals
    2·S_i − T where S_i = sum(c·bit_i) ≥ 0 and T = sum(c), so only the
    NON-NEGATIVE S_i lanes need aggregating. Three 21-bit lanes per
    long pack 60 bits into 20 agg columns (3× fewer than the naive 60
    SUM(CASE…) columns, and pure shift/mask arithmetic — no branches).
    Lane capacity 2^21 tokens/doc is runtime-guarded with assert_true,
    not silently wrapped.

    Two deliberate per-family shapes (profiled at sf0.1, round 4):
    - md5: pre-aggregate (doc_id, tok) → count and hash each DISTINCT
      token once, weighting the vote by the count — identical integer
      votes with ~4× fewer of the 3-string-op md5 hashes;
    - xxhash64: hash every token INSTANCE directly (the hash is one
      cheap JVM call, cheaper than the extra (doc_id, tok) combine
      shuffle the pre-agg costs — measured 0.3 s of the round-3
      2.4 s).
    All expressions are built as single SQL strings (F.expr), not
    nested Column trees: constructing ~360 py4j Column nodes per call
    dominated plan-build time (measured ~0.7 s/run of the round-3
    2.4 s — fixed driver overhead, but bench measures it).
    """
    pre_aggregate = hash_family == "md5"
    tokens = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.length("tok") > 0)
    if pre_aggregate:
        src = tokens.groupBy("doc_id", "tok").agg(
            F.count(F.lit(1)).alias("c")
        )
        weight, total = " * c", "sum(c)"
    else:
        src = tokens
        weight, total = "", "count(1)"
    h = src.selectExpr(
        "doc_id",
        f"({_token_hash_sql(hash_family)}) AS h",
        *(["c"] if pre_aggregate else []),
    )
    aggs = [f"{total} AS t"] + [
        "sum("
        + " + ".join(
            f"shiftleft((shiftright(h, {k * _LANES + j}) & 1){weight},"
            f" {_LANE_BITS * j})"
            for j in range(_LANES)
        )
        + f") AS p{k}"
        for k in range(SIMHASH_BITS // _LANES)
    ]
    votes = h.groupBy("doc_id").agg(*[F.expr(a) for a in aggs])
    # vote_i > 0  ⇔  2·S_i > T   (exactly sum(±c) > 0)
    sim_val = " + ".join(
        f"(cast(((shiftright(p{i // _LANES}, {_LANE_BITS * (i % _LANES)})"
        f" & {(1 << _LANE_BITS) - 1}) * 2 > t) as long) * {1 << i})"
        for i in range(SIMHASH_BITS)
    )
    # guard folded INTO the value expression (a separate dropped column
    # would be pruned by Catalyst and never evaluated): assert_true
    # yields NULL when the condition holds, throws at runtime otherwise
    guard = (
        f"assert_true(t < {1 << _LANE_BITS}, 'simhash vote lane overflow: "
        "document exceeds 2^21 tokens')"
    )
    return votes.selectExpr(
        "doc_id", f"if(isnull({guard}), cast({sim_val} as long), null) AS simhash"
    )


def q_dedup_simhash(
    spark: SparkSession, sf_dir: str, hash_family: str = "xxhash64"
) -> DataFrame:
    """60-bit SimHash per document + hamming-near pairs (≤ 6 bits).

    Per-bit weighted vote; then a band join on four 15-bit sub-keys
    (single-band buckets, the standard Charikar trick — recall < 1 by
    construction; the md5 oracle mirrors the banding exactly so that
    check is still exact). ``hash_family`` selects the token hash:
    xxhash64 is the production default (one JVM call per token), md5 is
    kept for the DuckDB oracle run (see _token_hash_sql). The vote
    aggregation packs three 21-bit non-negative lanes per long (20 agg
    columns for 60 bits, map-side combined) — see the in-body notes.
    """
    sim = simhash_values(_docs(spark, sf_dir), hash_family)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("simhash"), 15 * k)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("key"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.key")
    # SINGLE-PASS bucket pairing, not a self-join: a self-join on
    # (band, key) evaluates the whole simhash lineage (tokenize →
    # (doc_id, tok) agg → vote agg) once PER SIDE — the plan audit
    # showed the agg subtree twice with no ReusedExchange. One groupBy
    # collects each bucket's (doc_id, simhash) list, then pairs expand
    # in-row (two explodes) — exactly the rows the join produced, with
    # ONE pass over the lineage and one shuffle on the uniform
    # (band, key) key. Bucket lists are near-dup-band-sized (tiny by
    # construction; a pathological all-identical corpus degenerates the
    # pair OUTPUT quadratically in either formulation, so the list adds
    # no new failure mode).
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ds"))
        .where(F.size("ds") > 1)
    )
    pairs = (
        buckets.select(F.explode("ds").alias("a"), "ds")
        .select("a", F.explode("ds").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= 6)
        .distinct()  # the same pair can collide in several bands
        .select("id_a", "id_b", "hamming")
    )
    return pairs


def _oracle_simhash() -> str:
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(SIMHASH_BITS)
    )
    val = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(tok), 1, 15)) AS UBIGINT) AS BIGINT) AS h
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
  WHERE LENGTH(tok) > 0
), votes AS (
  SELECT doc_id,
         {votes}
  FROM toks GROUP BY doc_id
), sim AS (
  SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM votes
), bands AS (
  SELECT doc_id, simhash, band, (simhash >> (15 * band)) & 32767 AS key
  FROM sim, (SELECT UNNEST([0, 1, 2, 3]) AS band) bb
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 6
"""


# -------------------------------------------------- decontamination
_DECON_N = 5  # word n-gram width (GPT-3 used 13-grams; scaled to this corpus)
_DECON_BENCH_DOCS = 20  # doc_id < this = the held-out benchmark set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training documents sharing any word
    ``_DECON_N``-gram with the held-out set (doc_id < 20 stands in for an eval
    benchmark) are flagged with their distinct-overlap count — the
    standard test-set-leakage filter run before pretraining.

    Scale shape: the benchmark side is tiny at ANY corpus size
    (benchmarks are fixed), so its distinct n-gram set BROADCASTS and
    the train side never shuffles for the probe — one map-side join +
    one combined count per flagged doc. n-grams are compared by
    xxhash64 internally… kept as plain strings here so the DuckDB
    oracle is byte-exact (hashing is an engine-internal choice; at
    100 TB hash the gram to an 8-byte key first)."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    idx = F.sequence(F.lit(0), n - _DECON_N)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k + 1) for k in range(_DECON_N)]
        ),
    )
    g = d.where(n >= _DECON_N).select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("gram")
    )
    bench = (
        g.where(F.col("doc_id") < _DECON_BENCH_DOCS).select("gram").distinct()
    )
    train = g.where(F.col("doc_id") >= _DECON_BENCH_DOCS)
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_grams"))
    )


ORACLE_DECONTAMINATE = f"""
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct([
           list_aggregate(w[i:i+{_DECON_N - 1}], 'string_agg', ' ')
           FOR i IN RANGE(1, len(w) - {_DECON_N - 2})])) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= {_DECON_N}
), bench AS (
  SELECT DISTINCT gram FROM g WHERE doc_id < {_DECON_BENCH_DOCS}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
FROM g JOIN bench USING (gram)
WHERE doc_id >= {_DECON_BENCH_DOCS}
GROUP BY doc_id
"""


# ------------------------------------------------------ incremental dedup
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (snapshot-vs-corpus) near-dedup: for every NEW
    document (doc_id % 100 == 0 — the fresh crawl slice), decide
    whether an EXISTING document (the other 99%) already covers it at
    Jaccard ≥ 0.5, and name the smallest matching old doc_id — the
    continuously-crawled-corpus shape where re-deduping the whole
    corpus per increment is wasteful.

    Scale shape: this is the asymmetric win over full-corpus LSH —
    the new slice's band table is BROADCAST — valid only because the
    increment is ORDERS smaller than the corpus (1% here; a slice that
    grows with the corpus must drop the broadcast hint and let AQE pick
    the join) — so the old side streams its bands map-side with NO
    corpus-wide shuffle for candidates;
    exact-Jaccard verification touches candidate pairs only. Oracle:
    exact new×old Jaccard in SQL (band recall ≈1 at J≥0.5, same
    argument as q_dedup_minhash_lsh). New docs with <3 words carry no
    shingles and report is_dup=0 in both engines."""
    d = _docs(spark, sf_dir)
    sh = _shingles_df(spark, sf_dir)
    bands = _minhash_bands(sh)
    new_bands = bands.where(F.col("doc_id") % 100 == 0)
    old_bands = bands.where(F.col("doc_id") % 100 != 0)
    cand = (
        old_bands.alias("o")
        .join(
            F.broadcast(new_bands.alias("n")),
            (F.col("o.band") == F.col("n.band"))
            & (F.col("o.bsig") == F.col("n.bsig")),
        )
        .select(
            F.col("n.doc_id").alias("new_id"),
            F.col("o.doc_id").alias("old_id"),
        )
        .distinct()
    )
    # candidate-restricted verification: checkpoint the tiny pair
    # table (it is referenced twice), then re-shingle ONLY the
    # candidate docs — never the full corpus — for the exact verify
    # joins. Here (unlike q_dedup_minhash_lsh, where the restricted
    # shape measured slower and was rejected) candidates are bounded
    # by the 1% new slice, so the full-corpus shingle passes the old
    # shape paid were almost entirely wasted: measured 8.2 s → 3.9 s
    # at the sf1 rung. No broadcast hint on the semi-join; AQE picks.
    cand = cand.localCheckpoint(eager=False)
    cand_ids = (
        cand.select(F.explode(F.array("new_id", "old_id")).alias("doc_id"))
        .distinct()
    )
    shc = _shingles(d.join(cand_ids, "doc_id", "left_semi"))
    sh_n = shc.select(F.col("doc_id").alias("new_id"), "shingle")
    sh_o = shc.select(F.col("doc_id").alias("old_id"), "shingle")
    inter = (
        cand.join(sh_n, "new_id")
        .join(sh_o, ["old_id", "shingle"])
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sn = sizes.select(F.col("doc_id").alias("new_id"), F.col("n_sh").alias("nn"))
    so = sizes.select(F.col("doc_id").alias("old_id"), F.col("n_sh").alias("no"))
    j = inter.join(sn, "new_id").join(so, "old_id").select(
        "new_id",
        "old_id",
        F.round(
            F.col("n_common")
            / (F.col("nn") + F.col("no") - F.col("n_common")).cast("double"),
            6,
        ).alias("jac"),
    )
    m = (
        j.where(F.col("jac") >= 0.5)
        .groupBy("new_id")
        .agg(
            F.min("old_id").cast("long").alias("matched_old"),
            F.max("jac").alias("best_jaccard"),
        )
    )
    return (
        d.where(F.col("doc_id") % 100 == 0)
        .select("doc_id")
        .join(m.withColumnRenamed("new_id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("matched_old").isNotNull().cast("int").alias("is_dup"),
            "matched_old",
            "best_jaccard",
        )
    )


ORACLE_INCREMENTAL = """
WITH sh AS (
  SELECT doc_id, UNNEST(list_distinct([
           w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN RANGE(1, len(w) - 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS old_id, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % 100 = 0 AND b.doc_id % 100 != 0
  GROUP BY 1, 2
), j AS (
  SELECT new_id, old_id,
         ROUND(n_common / CAST(sn.n_sh + so.n_sh - n_common AS DOUBLE), 6)
           AS jac
  FROM inter
  JOIN sizes sn ON sn.doc_id = new_id
  JOIN sizes so ON so.doc_id = old_id
), m AS (
  SELECT new_id, CAST(MIN(old_id) AS BIGINT) AS matched_old,
         MAX(jac) AS best_jaccard
  FROM j WHERE jac >= 0.5 GROUP BY 1
)
SELECT d.doc_id, CAST(m.new_id IS NOT NULL AS INT) AS is_dup,
       m.matched_old, m.best_jaccard
FROM (SELECT doc_id FROM documents WHERE doc_id % 100 = 0) d
LEFT JOIN m ON m.new_id = d.doc_id
"""


# ----------------------------------------------------- dedup clustering
def _cc_large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every node u connects its strictly-larger
    neighbors to m(u) = min(Γ(u) ∪ {u}). Input/output: symmetric-free
    edge list (src, dst); output rows are src > dst by construction."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least(F.col("src"), F.col("mn")).alias("m"))
    )
    return (
        sym.join(m, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _cc_small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges large→small, then every node
    u connects all its (smaller) neighbors and itself to
    m(u) = min(Γ(u) ∪ {u})."""
    o = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    m = o.groupBy("src").agg(F.min("dst").alias("m"))
    relink = (
        o.join(m, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    selflink = m.select("src", F.col("m").alias("dst"))
    return relink.unionByName(selflink).distinct()


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_rounds: int = 30
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star connected components.

    ``edges``: (src, dst) pair list (any orientation, self-loops ok);
    ``nodes``: one ``doc_id`` column covering all vertices (so
    singletons get labels). Returns (labels_df[doc_id, label], rounds).

    Convergence is O(log n) rounds even for path graphs (vs the
    O(diameter) of plain min-label propagation). Each round's edge set
    is ``localCheckpoint``ed: lineage is truncated so round i never
    replays rounds 0..i-1 — the fix for the geometric-recompute trap a
    persist-then-unpersist chain falls into. The per-round driver read
    is ONE aggregated row (count + order-independent xxhash checksum),
    never data; fixpoint ⇔ the (count, checksum) signature repeats,
    exact up to a 2⁻⁶⁴ hash collision per round.
    """
    cur = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    sig = None
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        cur = _cc_small_star(_cc_large_star(cur)).localCheckpoint()
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: order-independent AND overflow-free
            # under ANSI mode (a sum of 2^63-scale hashes throws)
            F.expr("bit_xor(xxhash64(src, dst))").alias("x"),
        ).collect()[0]
        new_sig = (row["n"], row["x"])
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # at fixpoint the edges form stars src→root (root = component min);
    # nodes absent from the edge list are singletons labeling themselves
    stars = cur.groupBy("src").agg(F.min("dst").alias("root"))
    labels = (
        nodes.select(F.col("doc_id").cast("long"))
        .join(stars.select(F.col("src").alias("doc_id"), "root"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("label")
        )
    )
    return labels, rounds


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the
    MinHash+LSH J≥0.5 pair graph, every document labeled with its
    component's minimum doc_id (singletons label themselves) — the
    keep-one-per-cluster step real training pipelines run after pair
    generation.

    Components via alternating large-star/small-star (see
    ``connected_components``): O(log n) rounds on pathological chain
    graphs, per-round lineage truncated with ``localCheckpoint`` so no
    round replays its predecessors. Per round: two min-aggs + two
    self-joins on uniformly-hashed ids, all map-side combined; the only
    driver reads are one-row convergence signatures.
    """
    pairs = q_dedup_minhash_lsh(spark, sf_dir).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    docs = _docs(spark, sf_dir).select("doc_id")
    labels, _ = connected_components(pairs, docs)
    return labels.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )


# recursive-CTE oracle: cluster id = min doc_id reachable in the
# (symmetric) J≥0.5 pair graph; edge set = the exact-Jaccard pair SQL
# (valid for the same reason ORACLE_NGRAM checks the minhash query:
# candidates are exact-verified and band recall at J≥0.5 ≈ 1)
ORACLE_CLUSTERS = (
    """
WITH RECURSIVE sh AS (
  SELECT doc_id, UNNEST(list_distinct([
           w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN RANGE(1, len(w) - 1)])) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 3
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           ROUND(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS j
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b)
  WHERE j >= 0.5
), edges AS (
  SELECT id_a, id_b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
), reach(src, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.src, e.id_b FROM reach r JOIN edges e ON e.id_a = r.node
)
SELECT CAST(src AS BIGINT) AS doc_id, CAST(MIN(node) AS BIGINT) AS cluster_id
FROM reach GROUP BY src
"""
)


def _q_dedup_simhash_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_dedup_simhash(spark, sf_dir, hash_family="md5")


QUERIES = {
    "dedup_exact": (q_dedup_exact, ORACLE_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, ORACLE_NGRAM),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, ORACLE_NGRAM),
    "dedup_incremental": (q_dedup_incremental, ORACLE_INCREMENTAL),
    # oracle entry pins the md5 family (DuckDB-reproducible values);
    # the production xxhash64 default is the rows-only _fast entry
    "dedup_simhash": (_q_dedup_simhash_oracle, _oracle_simhash()),
    "dedup_simhash_fast": (q_dedup_simhash, None),
    "dedup_clusters": (q_dedup_clusters, ORACLE_CLUSTERS),
    "decontaminate": (q_decontaminate, ORACLE_DECONTAMINATE),
}
