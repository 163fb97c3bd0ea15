"""Oracle parity for the registry tail the driver does NOT record.

The driver's CORRECTNESS run caps at 50 rows; positions 51-59 are a
deliberate, documented drop set (tests/test_contract_registry.py).
Eight of the nine dropped entries are oracle-bearing and were green in
earlier rounds — this test keeps them green by running the SAME
Spark-vs-DuckDB comparison the driver runs (row count, column names,
value equality after name-sorted columns, floats at 6 dp), so dropping
them from the recorded file never silently drops their verification.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

# the oracle-bearing slice of the documented drop set (round-5
# rotation: latest_event_per_user / exists_high_qty / percentile_price
# / tumbling_window_events went back inside the driver cap; these six
# are this round's dropped tail)
DROPPED_ORACLE_QUERIES = [
    "range_join_error_clicks",
    "moving_avg_revenue",
    "sessionize_events",
    "source_stats",
    "asof_last_error",
    "regional_revenue",
    "topk_orders",
    "corpus_rollup",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DROPPED_ORACLE_QUERIES)
def test_dropped_registry_tail_matches_oracle(spark, oracle_con, name):
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert name in qs and name in oracles, (
        "documented drop set drifted away from the registry"
    )
    sdf = qs[name](spark, SF).toPandas()
    odf = oracle_con.execute(oracles[name]).df()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), (name, cols, sorted(odf.columns))
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o), (name, len(s), len(o))
    for c in cols:
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            assert (
                s[c].astype(float).round(6).equals(o[c].astype(float).round(6))
            ), f"{name}: float column {c} diverges"
        else:
            assert s[c].astype(str).equals(o[c].astype(str)), (
                f"{name}: column {c} diverges"
            )
