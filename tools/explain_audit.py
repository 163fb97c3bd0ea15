"""Plan audit: `.explain("formatted")` for the headline queries, with
assertions on the physical properties that matter at 100 TB —
predicate pushdown, column pruning, broadcast joins, partial
aggregation, TakeOrderedAndProject. Writes PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

CHECKS = {
    # query -> list of (regex, why it must appear)
    "filter_drop_score": [
        (r"PushedFilters: \[.*GreaterThanOrEqual\(l_quantity", "filter pushed to parquet scan"),
        (r"ReadSchema: [^\n]*l_quantity", "column pruning: only needed columns read"),
    ],
    "pricing_summary": [
        (r"HashAggregate", "partial hash aggregation"),
        (r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", "date filter pushed down"),
    ],
    "topk_orders": [
        (r"TakeOrderedAndProject", "top-k without full sort"),
    ],
    "anti_join_resume": [
        (r"BroadcastHashJoin .*LeftAnti", "broadcast anti-join (no big-side shuffle)"),
    ],
    "join_order_lines": [
        (r"HashAggregate", "aggregation after join"),
    ],
    "dedup_exact": [
        (r"HashAggregate", "hash groupBy"),
    ],
    "ann_cosine_topk": [
        (r"BroadcastNestedLoopJoin|BroadcastHashJoin", "query side broadcast"),
    ],
    "html_extract_docs": [
        (r"MapInPandas|ArrowEvalPython|FlatMapGroupsInPandas|PythonMapInArrow", "vectorized Arrow Python stage"),
        (r"ReadSchema: [^\n]*text", "scan reads payload column"),
    ],
    "ann_ivf": [
        (r"BroadcastNestedLoopJoin|BroadcastHashJoin", "centroid/query side broadcast (no big-side shuffle for assignment)"),
        (r"partial_min\(struct\(dist", "map-side partial agg for the cell argmin (SortAggregate: struct-min)"),
        (r"WindowGroupLimit", "per-partition top-k pushed below the rank shuffle"),
    ],
    "dedup_simhash": [
        (r"HashAggregate", "map-side partial aggregation of the packed vote lanes"),
        (r"!Join", "single-pass band buckets: no self-join, the simhash lineage is computed once"),
        (r"collect_list", "in-bucket pair expansion from one grouped pass"),
    ],
    "repetition_stats": [
        (r"HashAggregate", "per-doc gram aggregations with map-side combine"),
        (r"!CartesianProduct", "no cross join anywhere in the stats plan"),
    ],
    "stratified_sample": [
        (r"WindowGroupLimit", "per-stratum top-k pushed below the rank shuffle"),
        (r"!CartesianProduct", "one stratum-key shuffle only"),
    ],
    "pii_scrub": [
        (r"!BatchEvalPython", "regex scrub is JVM-side (no Python UDF)"),
        (r"!HashAggregate", "pure per-row projection: no agg/join, the only exchange is the documented test-corpus fan-out (read_fanout)"),
    ],
    "chunk_documents": [
        (r"Generate", "per-row sliding-window explode (map-side fan-out)"),
        (r"!BatchEvalPython", "no Python UDF in the chunking expressions"),
        (r"!SortMergeJoin", "no join: the only exchange is the documented test-corpus fan-out (read_fanout)"),
    ],
    "pack_sequences": [
        (r"BroadcastHashJoin", "superchunk running-offsets (n_docs/chunk² rows) broadcast onto chunk totals; AQE broadcasts the chunk-offsets join when it fits"),
        (r"!CartesianProduct", "three-level prefix sum: the only unpartitioned window runs over superchunk totals (n_docs/chunk² rows), never corpus rows"),
    ],
    "gopher_filter": [
        (r"HashAggregate", "bigram-mass agg with map-side combine (the one shuffle)"),
        (r"!CartesianProduct", "per-row array expressions for every other rule: no joins beyond the bigram side"),
    ],
    "lm_quality": [
        (r"BroadcastHashJoin", "alphabet²-sized model tables broadcast (doc side never shuffles for the score join)"),
        (r"HashAggregate", "map-side combined bigram aggregations"),
    ],
    "decontaminate": [
        (r"BroadcastHashJoin", "benchmark n-gram set broadcast (train side never shuffles for the probe)"),
    ],
    "ann_lsh_bucketed": [
        (r"!CartesianProduct", "banded LSH: candidates come from bucket groupBys, never an all-pairs join"),
        (r"!SortMergeJoin", "no joins at all: buckets collect in one groupBy, pairs expand in-row, a second groupBy dedupes across bands before scoring"),
        (r"HashAggregate", "bucket collect + cross-band pair dedupe are map-side-combined aggregates"),
    ],
    "dedup_incremental": [
        (r"BroadcastHashJoin", "the new-snapshot band table broadcasts; the corpus side streams map-side (no corpus-wide candidate shuffle)"),
        (r"!CartesianProduct", "bucketed candidates only"),
        (r"LeftSemi", "exact verification re-shingles CANDIDATE docs only: source docs semi-joined to the checkpointed pair ids before the shingle explode"),
        (r"Scan ExistingRDD|LogicalRDD", "candidate pair table served from a localCheckpoint-truncated lineage (band pipeline runs once, not once per reference)"),
    ],
    "dedup_clusters": [
        (r"Scan ExistingRDD|LogicalRDD", "fixpoint star edges served from a localCheckpoint-truncated lineage (no iteration replay)"),
        (r"!InMemoryTableScan", "no persist chain left behind: rounds checkpoint, they don't cache"),
    ],
    "dedup_simhash_fast": [
        (r"HashAggregate", "map-side partial aggregation of the packed vote lanes"),
        (r"xxhash64", "production token-hash family (one JVM call, no md5/conv chain)"),
        (r"!Join", "single-pass band buckets: no self-join, the simhash lineage is computed once"),
    ],
    "media_frame_sample": [
        (r"MapInPandas|ArrowEvalPython|PythonMapInArrow", "vectorized Arrow Python stages (synth + sample)"),
    ],
    "pdf_extract_docs": [
        (r"MapInPandas|ArrowEvalPython|PythonMapInArrow", "vectorized Arrow Python stages (pdf synth + extract)"),
        (r"PushedFilters: \[.*doc_id", "doc_id slice pushed to the parquet scan"),
    ],
    "sessionize_events": [
        (r"Window", "window function (single shuffle on session key)"),
    ],
    "latest_event_per_user": [
        (r"WindowGroupLimit", "rn=1 pushed below the shuffle (per-partition prune)"),
    ],
    "regional_revenue": [
        (r"BroadcastHashJoin", "dimension tables broadcast (fact side never shuffles pre-agg)"),
        (r"HashAggregate", "partial aggregation after the star join"),
    ],
    "source_stats": [
        (r"HashAggregate", "two-phase hash aggregation"),
        (r"Keys \[2\]: \[source[^\n]*lang", "distinct rewritten to (source,lang) pre-aggregation (no Expand)"),
        (r"count\(distinct lang", "final distinct count"),
    ],
    "set_ops_customer_years": [
        (r"BroadcastHashJoin LeftSemi", "INTERSECT → broadcast left-semi join"),
        (r"BroadcastHashJoin LeftAnti", "EXCEPT → broadcast left-anti join"),
        (r"PushedFilters: \[.*o_orderdate", "year slice pushed to parquet scan"),
    ],
    "tumbling_window_events": [
        (r"HashAggregate", "two-phase hash aggregation on (window, type)"),
        (r"!Window\b", "no window-function node — tumbling agg is a plain groupBy"),
    ],
    "percentile_price": [
        (r"ObjectHashAggregate", "typed-agg path with map-side partial percentile buffers"),
    ],
    "range_join_error_clicks": [
        (r"Generate", "error rows expanded to (bin, bin+1) probes"),
        (r"Join Inner", "range match is an equi-join on (user, bin) + residual range condition"),
        (r"!BroadcastNestedLoopJoin", "no theta-join explosion — the bucketing keeps it hash-joinable"),
    ],
    "moving_avg_revenue": [
        (r"HashAggregate", "distributed day-level pre-aggregation"),
        (r"Window", "ROWS frame window over the reduced day series"),
    ],
    "dedup_url_canonical": [
        (r"HashAggregate", "canonical-url hash groupBy with map-side combine"),
        (r"!BatchEvalPython|ArrowEvalPython|MapInPandas", "url surgery is pure JVM regexp — no Python stage"),
    ],
    "domain_profile": [
        (r"count\(distinct lang", "per-host distinct-lang aggregate"),
    ],
    "sample_split": [
        (r"HashAggregate", "hash-bucket split rollup with map-side combine"),
        (r"!Sample", "no RNG Sample operator — determinism comes from md5 buckets"),
    ],
    "char_entropy": [
        (r"HashAggregate", "two-phase char-count + entropy aggregations (map-side combine)"),
        (r"explode\(sequence", "position explode feeding substr"),
    ],
    "exists_high_qty": [
        (r"Join LeftSemi", "correlated EXISTS decorrelated to a left-semi join"),
        (r"PushedFilters: \[.*l_quantity", "subquery predicate pushed to the lineitem scan"),
    ],
    "dedup_substring": [
        (r"HashAggregate", "gram→(count, first-occurrence) groupBy with map-side combine (the one corpus-wide shuffle, on an md5 key — uniform by construction)"),
        (r"explode\(transform\(sequence", "map-side K-window gram explode, no token-level join-back"),
        (r"!CartesianProduct", "nothing all-pairs: duplicated spans come from the gram agg, islands merge inside a per-doc window"),
        (r"!BatchEvalPython", "span cut is filter-with-index array expressions, JVM-side"),
    ],
    "mixture_sample": [
        (r"explode\(slice\(sequence", "integer-part replication is a map-side explode"),
        (r"!HashAggregate", "pure projection + explode: no agg, no corpus shuffle at any scale"),
        (r"!SortMergeJoin", "no join: the only exchange is the documented test-corpus fan-out (read_fanout)"),
        (r"!BatchEvalPython", "md5-bucket Bernoulli is JVM-side expressions"),
    ],
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from ragflow_ocr_spark.spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    qs = entrymod.queries()
    out_lines = ["# PLANS — physical-plan audit (auto-generated)\n"]
    failures = []
    for name, checks in CHECKS.items():
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            # one broken query must not abort the audit or lose
            # PLANS.md for the queries that passed
            out_lines.append(f"\n## {name}\n\n- [MISSING] query raised: {e}\n")
            failures.append((name, f"raised {type(e).__name__}"))
            print(f"MISSING {name}: raised {type(e).__name__}: {e}")
            continue
        out_lines.append(f"\n## {name}\n")
        for rx, why in checks:
            # "!" prefix = the pattern must NOT appear in the plan
            if rx.startswith("!"):
                ok = re.search(rx[1:], plan) is None
            else:
                ok = re.search(rx, plan) is not None
            status = "OK " if ok else "MISSING"
            out_lines.append(f"- [{status}] {why} (`{rx}`)")
            if not ok:
                failures.append((name, why))
            print(f"{status} {name}: {why}")
        out_lines.append("\n```\n" + plan[:4000] + "\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out_lines))
    print(f"\n{len(failures)} plan-check failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
