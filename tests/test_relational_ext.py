"""Extended relational surface (ops/relational_ext.py): semantics and
plan-shape pins that the DuckDB gate can't express — the bucketed
range join must equal the naive theta-join formulation row-for-row,
and its plan must stay hash-joinable (no nested-loop explosion)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from ragflow_ocr_spark.ops import relational_ext as rx

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_range_join_matches_naive_theta_join(spark):
    """The bin-expansion trick (explode to [bin, bin+1], equi-join,
    residual range filter) must produce exactly the naive inequality
    join's result — every error event, every click count."""
    bucketed = {
        (r.err_id, r.user_id): r.n_clicks
        for r in rx.q_range_join_error_clicks(spark, SF).collect()
    }

    ev = spark.read.parquet(f"{SF}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    errs = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", us.alias("err_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), us.alias("clk_us")
    )
    naive = (
        errs.join(
            clicks,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("clk_us") > F.col("err_us"))
            & (F.col("clk_us") <= F.col("err_us") + 300 * 1_000_000),
            "left",
        )
        .groupBy("err_id", "user_id")
        .agg(F.count("clk_us").alias("n_clicks"))
    )
    expected = {(r.err_id, r.user_id): r.n_clicks for r in naive.collect()}
    assert bucketed == expected
    assert len(bucketed) > 0
    assert any(v > 0 for v in bucketed.values())


def test_range_join_plan_is_hash_joinable(spark):
    plan = _plan(rx.q_range_join_error_clicks(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the bin-probe expansion
    assert "Join Inner" in plan or "BroadcastHashJoin" in plan


def test_set_ops_partition_customers_exactly(spark):
    """Each custkey appears in at most one tag, and both/only tags
    reconstruct the year membership sets exactly."""
    rows = rx.q_set_ops_customer_years(spark, SF).collect()
    seen: dict[int, str] = {}
    for r in rows:
        assert r.c_custkey not in seen, "tags must partition customers"
        seen[r.c_custkey] = r.tag

    o = spark.read.parquet(f"{SF}/orders.parquet")
    y95 = {
        r.o_custkey
        for r in o.where(F.year("o_orderdate") == 1995).select("o_custkey").collect()
    }
    y96 = {
        r.o_custkey
        for r in o.where(F.year("o_orderdate") == 1996).select("o_custkey").collect()
    }
    assert {k for k, t in seen.items() if t == "both"} == y95 & y96
    assert {k for k, t in seen.items() if t == "only_1995"} == y95 - y96
    assert {k for k, t in seen.items() if t == "only_1996"} == y96 - y95


def test_tumbling_windows_align_to_epoch_and_cover_all_events(spark):
    out = rx.q_tumbling_window_events(spark, SF)
    rows = out.collect()
    total = sum(r.n for r in rows)
    ev_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == ev_n
    for r in rows:
        epoch = r.window_start.timestamp()
        assert epoch % rx._WIN_S == 0, "window starts must align to 6h epoch grid"


def test_moving_avg_first_row_equals_daily(spark):
    rows = rx.q_moving_avg_revenue(spark, SF).orderBy("day").collect()
    assert len(rows) > 10
    # frame is ROWS 6 PRECEDING: first row's ma7 == its own daily value
    assert abs(rows[0].ma7 - round(rows[0].daily_rev, 2)) < 1e-9
    # window must be a true moving average: ma7 of row 7 equals the
    # mean of daily_rev rows 1..7
    window7 = [r.daily_rev for r in rows[:7]]
    assert abs(rows[6].ma7 - round(sum(window7) / 7, 2)) < 1e-6


def test_percentile_interpolates(spark):
    rows = rx.q_percentile_price(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.median_price <= r.p90_price <= r.max_price
