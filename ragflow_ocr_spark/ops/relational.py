"""Relational surface for the driver contract (SURVEY.md §2 →
SQL-checkable form; FIXTURES.md §5).

Each query is the relational analogue of a pipeline operator, expressed
with built-in DataFrame functions only (JVM-side, whole-stage codegen;
no Python in the hot path). Scale notes per query in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- queries
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical partial-agg showcase. All heavy
    lifting is map-side combine; shuffle carries ≤ |groups| rows per
    task. At 100 TB this is scan-bound — exactly what we want."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2002-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2002-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_filter_drop_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 drop-score analogue: threshold filter, fully pushed into the
    parquet scan (shows up in PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 45.0) & (F.col("l_discount") < 0.02)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


ORACLE_FILTER = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem WHERE l_quantity >= 45.0 AND l_discount < 0.02
"""


def q_agg_run_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 run-metrics analogue: count/avg/min/max/sum per group."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


ORACLE_METRICS = """
SELECT event_type, COUNT(*) AS n,
       ROUND(AVG(value), 6) AS avg_value,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value,
       ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY event_type
"""


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 max_candidates analogue: global top-k. orderBy+limit compiles
    to TakeOrderedAndProject — per-partition heap + driver merge, no
    full sort, no full shuffle. Ties broken by key for determinism."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(100)
    )


ORACLE_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def q_rank_reading_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 reading-order analogue: rank within a document (order) by
    position; keep first 3. Single hash-partitioned window — the
    partition key (orderkey) is high-cardinality so no skew."""
    li = _t(spark, sf_dir, "lineitem")
    # l_linenumber is NOT unique per order in this dataset → full
    # tiebreak chain so row_number is deterministic across engines
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("l_orderkey", "l_linenumber", "rank", "l_quantity")
    )


ORACLE_RANK = """
SELECT l_orderkey, l_linenumber, rank, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
            ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey) AS rank
  FROM lineitem) WHERE rank <= 3
"""


def q_anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 resume anti-join: rows not yet 'done'. The done-side is small
    → broadcast hint, zero shuffle on the big side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    done = (
        o.where(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.join(F.broadcast(done), on="c_custkey", how="left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
    )


ORACLE_ANTI = """
SELECT c_custkey, c_name, c_nationkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000 AND o_custkey IS NOT NULL)
"""


def q_join_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 zip-join analogue: equi-join then per-key agg. Shuffle on the
    join key; AQE picks broadcast automatically when one side fits."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


ORACLE_JOIN = """
SELECT o_orderpriority, COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 2) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


def q_payload_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 router analogue: CASE-route rows, count per route."""
    d = _t(spark, sf_dir, "documents")
    route = (
        F.when(F.col("lang") == "en", F.lit("latin"))
        .when(F.col("lang").isin("zh", "ja"), F.lit("cjk"))
        .when(F.col("lang").isNull(), F.lit("unknown"))
        .otherwise(F.lit("other"))
    )
    return (
        d.withColumn("route", route)
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


ORACLE_ROUTER = """
SELECT CASE WHEN lang = 'en' THEN 'latin'
            WHEN lang IN ('zh','ja') THEN 'cjk'
            WHEN lang IS NULL THEN 'unknown'
            ELSE 'other' END AS route,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-window sessionization (streaming analogue in batch): new
    session when gap > 30 min. Windows partition by user — shuffle
    once, both lag and the running sum reuse the same partitioning."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (unix_micros ⇔ DuckDB epoch_us) — second
    # truncation would disagree with the oracle at fractional boundaries
    # ts is TIMESTAMP_NTZ in the parquet; cast for unix_micros — the
    # constant tz offset cancels in the gap difference
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    ).over(w)
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


ORACLE_SESSION = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS session_value
FROM s GROUP BY user_id, session_id
"""


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest-version-per-key — the crawl idiom for url-version
    dedup (a recrawled page supersedes the old capture), exercised on
    the events table: newest event per user, ties broken by event_id,
    with a JSON property extracted from the props column. Window
    row_number desc = 1 → single shuffle on the key; at crawl scale
    the same plan keeps the newest warc_ts per url."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("prop_k"),
        )
    )


ORACLE_LATEST = """
SELECT user_id, event_id, ts, event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""


def q_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus profile (count / distinct langs / char stats)
    — the monitoring aggregation a corpus-curation pipeline runs after
    every ingest. One hash-groupBy with map-side combine; distinct-agg
    expands then recombines (Expand + two-phase HashAggregate)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


ORACLE_SOURCE_STATS = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_chars), 6) AS avg_chars,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM documents GROUP BY source
"""


def q_asof_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every 'click' event, the user's most recent
    preceding-or-simultaneous 'error' event (ts, then event_id, as the
    time axis). Spark has no ASOF JOIN; the scalable formulation is a
    single window pass: carry last non-null error id/ts forward with
    last(..., ignorenulls) over ROWS UNBOUNDED PRECEDING — one shuffle
    on user_id, no range-join explosion, state O(1) per row. The
    oracle mirrors the same window (DuckDB IGNORE NULLS), so the
    tie-break at equal ts is identical in both engines."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    err_id = F.last(
        F.when(F.col("event_type") == "error", F.col("event_id")), ignorenulls=True
    ).over(w)
    err_ts = F.last(
        F.when(F.col("event_type") == "error", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("last_error_id", err_id)
        .withColumn("last_error_ts", err_ts)
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_error_id", "last_error_ts")
    )


ORACLE_ASOF = """
SELECT event_id, user_id, ts, last_error_id, last_error_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
           OVER w AS last_error_id,
         LAST_VALUE(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
           OVER w AS last_error_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING))
WHERE event_type = 'click'
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join (TPC-H Q5 shape): fact lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region, revenue per nation. Declared as plain joins —
    Catalyst reorders and broadcasts every dimension (region/nation/
    customer are tiny next to the fact table), so the fact side is
    scanned once with no shuffle until the final aggregation. The plan
    audit asserts the broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_REGIONAL = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical corpus report: ROLLUP(source, lang) — per-(source,
    lang) cells, per-source subtotals, grand total in ONE pass (Expand
    + single shuffle, vs three separate aggregations). grouping_id
    disambiguates real NULL lang values from subtotal placeholder
    rows — both engines emit the same standard encoding."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.grouping_id().alias("gid"),
        )
    )


ORACLE_ROLLUP = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(GROUPING(source, lang) AS BIGINT) AS gid
FROM documents GROUP BY ROLLUP(source, lang)
"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, ORACLE_PRICING),
    "filter_drop_score": (q_filter_drop_score, ORACLE_FILTER),
    "agg_run_metrics": (q_agg_run_metrics, ORACLE_METRICS),
    "topk_orders": (q_topk_orders, ORACLE_TOPK),
    "rank_reading_order": (q_rank_reading_order, ORACLE_RANK),
    "anti_join_resume": (q_anti_join_resume, ORACLE_ANTI),
    "join_order_lines": (q_join_order_lines, ORACLE_JOIN),
    "payload_router": (q_payload_router, ORACLE_ROUTER),
    "sessionize_events": (q_sessionize_events, ORACLE_SESSION),
    "latest_event_per_user": (q_latest_event_per_user, ORACLE_LATEST),
    "source_stats": (q_source_stats, ORACLE_SOURCE_STATS),
    "asof_last_error": (q_asof_last_error, ORACLE_ASOF),
    "regional_revenue": (q_regional_revenue, ORACLE_REGIONAL),
    "corpus_rollup": (q_corpus_rollup, ORACLE_ROLLUP),
}
