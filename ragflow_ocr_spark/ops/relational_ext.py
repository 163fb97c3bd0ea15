"""Extended relational surface: set ops, tumbling windows, exact
percentiles, bucketed range join, moving-average window frames.

Fills the coverage corners the core surface (ops/relational.py) leaves
open — each is a shape a corpus-curation pipeline runs routinely, and
each is expressed with built-in DataFrame ops only (JVM-side,
whole-stage codegen) with a DuckDB oracle. Determinism rules follow
ops/__init__.py (DOUBLE + identical op order + ROUND on both sides,
identical aliases, unique-key tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- set ops
def q_set_ops_customer_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over customer-activity year slices: customers
    active in both 1995 and 1996, only-1995, only-1996, as one tagged
    frame. Each leg is a distinct-aggregate (shuffle on o_custkey) over
    a pushed-down year filter; INTERSECT/EXCEPT compile to hash
    left-semi/left-anti joins — AQE broadcasts the smaller side. At
    crawl scale this is the snapshot-diff idiom (urls present in crawl
    A vs crawl B)."""
    o = _t(spark, sf_dir, "orders")

    def year_keys(y: int) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").alias("c_custkey"))
            .distinct()
        )

    y95, y96 = year_keys(1995), year_keys(1996)
    tagged = (
        y95.intersect(y96).withColumn("tag", F.lit("both"))
        .unionAll(y95.subtract(y96).withColumn("tag", F.lit("only_1995")))
        .unionAll(y96.subtract(y95).withColumn("tag", F.lit("only_1996")))
    )
    return tagged.select("c_custkey", "tag")


ORACLE_SET_OPS = """
WITH y95 AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE EXTRACT(YEAR FROM o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders
             WHERE EXTRACT(YEAR FROM o_orderdate) = 1996)
SELECT c_custkey, 'both' AS tag      FROM (SELECT c_custkey FROM y95 INTERSECT SELECT c_custkey FROM y96)
UNION ALL
SELECT c_custkey, 'only_1995' AS tag FROM (SELECT c_custkey FROM y95 EXCEPT SELECT c_custkey FROM y96)
UNION ALL
SELECT c_custkey, 'only_1996' AS tag FROM (SELECT c_custkey FROM y96 EXCEPT SELECT c_custkey FROM y95)
"""


# ------------------------------------------------------- tumbling window
_WIN_S = 21600  # 6 hours


def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour window aggregation (the batch face of the
    streaming windowed-metrics surface in streaming/stream_extract.py):
    F.window on the TIMESTAMP_NTZ column directly — naive clock on both
    engines, epoch-aligned buckets, so the oracle's integer epoch
    arithmetic lands on identical boundaries. One hash shuffle on
    (window, event_type); map-side combine does the heavy lifting."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{_WIN_S} seconds"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ORACLE_TUMBLING = f"""
SELECT TIMESTAMP '1970-01-01 00:00:00'
         + (CAST(FLOOR(epoch(ts) / {_WIN_S}) AS BIGINT) * {_WIN_S}) * INTERVAL '1 second'
         AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ------------------------------------------------------ exact percentile
def q_percentile_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group: median and p90 retail
    price per brand. Spark's `percentile` and DuckDB's `quantile_cont`
    implement the same linear-interpolation-on-sorted-values estimator,
    so the check is exact after ROUND. Exact percentile sorts within
    each group — fine at |group| ≈ |parts|/|brands|; the 100 TB
    monitoring variant swaps in approx_percentile (t-digest, mergeable
    map-side) and is not oracle-checkable by design."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(p_retailprice, 0.9)"), 6).alias("p90_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
    )


ORACLE_PERCENTILE = """
SELECT p_brand, COUNT(*) AS n_parts,
       ROUND(quantile_cont(p_retailprice, 0.5), 6) AS median_price,
       ROUND(quantile_cont(p_retailprice, 0.9), 6) AS p90_price,
       ROUND(MAX(p_retailprice), 2) AS max_price
FROM part GROUP BY p_brand
"""


# ------------------------------------------------------ bucketed range join
_RANGE_S = 300  # clicks within 5 minutes after an error


def q_range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join without the explosion: for every 'error' event, count
    the same user's 'click' events in the following 5 minutes.

    A naive t BETWEEN t0 AND t0+Δ join is O(|A|·|B|) per user on a
    plain equi-key; the scale formulation buckets time into Δ-wide
    bins and duplicates each error row into its own bin and the next
    (a click ≤ Δ after an error is always in one of those two), so the
    join is a plain equi-join on (user_id, bin) with the exact range
    predicate applied post-join — pair volume bounded by bin
    co-occupancy, not by user history length. The oracle runs the
    naive inequality join; results are identical, only the plan
    differs."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # ntz→ltz offset cancels in diffs
    errs = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        us.alias("err_us"),
        F.floor(us / (_RANGE_S * 1_000_000)).alias("bin"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        us.alias("clk_us"),
        F.floor(us / (_RANGE_S * 1_000_000)).alias("c_bin"),
    )
    expanded = errs.withColumn(
        "probe_bin", F.explode(F.array(F.col("bin"), F.col("bin") + 1))
    )
    matched = (
        expanded.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("probe_bin") == F.col("c_bin")),
        )
        .where(
            (F.col("clk_us") > F.col("err_us"))
            & (F.col("clk_us") <= F.col("err_us") + _RANGE_S * 1_000_000)
        )
        .groupBy("err_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        errs.join(matched, "err_id", "left")
        .select(
            "err_id",
            "user_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_clicks"),
        )
    )


ORACLE_RANGE_JOIN = f"""
SELECT e.event_id AS err_id, e.user_id,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id AND c.event_type = 'click'
 AND epoch_us(c.ts) > epoch_us(e.ts)
 AND epoch_us(c.ts) <= epoch_us(e.ts) + {_RANGE_S} * 1000000
WHERE e.event_type = 'error'
GROUP BY 1, 2
"""


# --------------------------------------------------- moving-average frame
def q_moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily order revenue — the ROWS-frame
    window shape. Two phases: a distributed day-level aggregation
    (shuffle carries |days| rows), then the frame window over the
    day series. The window is single-partition by construction, which
    is correct here: post-agg cardinality is |days| (~2.4k over this
    corpus's 6.5 years), independent of fact-table size, so it stays
    driver-safe at 100 TB. Daily sums are rounded to 4 before the
    frame average so both engines average identical inputs; the final
    ROUND(…, 2) absorbs fp associativity differences (≤ 1e-8 here)."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("daily_rev"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn("ma7", F.round(F.avg("daily_rev").over(w), 2))
        .select("day", "daily_rev", "ma7")
    )


ORACLE_MOVING_AVG = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         ROUND(SUM(o_totalprice), 4) AS daily_rev
  FROM orders GROUP BY 1
)
SELECT day, daily_rev,
       ROUND(AVG(daily_rev) OVER (ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7
FROM daily
"""


# ------------------------------------------------- correlated subquery
# ONE ANSI SQL string, run verbatim by BOTH engines: Spark executes it
# via spark.sql over temp views (Catalyst rewrites the correlated
# EXISTS into a left-semi join — plan-asserted), DuckDB runs it as the
# oracle. TPC-H Q4 shape.
_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
GROUP BY o_orderpriority
"""


def q_exists_high_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) through the SQL surface.
    Catalyst decorrelates to a left-semi join on o_orderkey — one
    shuffle each side, the subquery never executes per-row. The exact
    same SQL text is the DuckDB oracle."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_EXISTS_SQL)


QUERIES = {
    "set_ops_customer_years": (q_set_ops_customer_years, ORACLE_SET_OPS),
    "exists_high_qty": (q_exists_high_qty, _EXISTS_SQL),
    "tumbling_window_events": (q_tumbling_window_events, ORACLE_TUMBLING),
    "percentile_price": (q_percentile_price, ORACLE_PERCENTILE),
    "range_join_error_clicks": (q_range_join_error_clicks, ORACLE_RANGE_JOIN),
    "moving_avg_revenue": (q_moving_avg_revenue, ORACLE_MOVING_AVG),
}
