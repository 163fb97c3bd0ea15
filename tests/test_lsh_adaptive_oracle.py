"""Value-check the ADAPTIVE-r regime of ``ann_lsh_bucketed``.

The driver's static DuckDB oracle mirrors r = PLANES_PER_BAND, which
``planes_per_band_for`` returns for every corpus the driver checks
(≤ 2048 vectors at target occupancy 8). The regime that carries the
100 TB claim — r growing with log2(n) so bucket occupancy stays
bounded — was previously pinned only by the sf1 bench *ratio*
(VERDICT r04 "What's wrong" #2). This test value-checks it: a
deterministic 2100-vector corpus pushes the rule to r = floor+1 = 9,
and the SAME Spark-vs-DuckDB comparison the driver runs (name-sorted
columns, floats at 6 dp) is applied against ``_oracle_lsh(9)`` — the
r-parameterized oracle — with the MAX_BUCKET rank-cap applied
identically on both engines.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ragflow_ocr_spark.ops import similarity as sim

N = 2100  # > 2048 → planes_per_band_for(N) == PLANES_PER_BAND + 1
DIM = sim._DIM


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Deterministic embeddings.parquet with enough rows to trigger the
    adaptive regime (same schema as the testdata table)."""
    d = tmp_path_factory.mktemp("lsh_adaptive")
    i = np.arange(N, dtype=np.float64)[:, None]
    j = np.arange(DIM, dtype=np.float64)[None, :]
    emb = np.sin(i * 0.7311 + j * 1.9973).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array((np.arange(N) % 7).astype(np.int32)),
        }
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


def test_rule_crosses_floor_at_this_n():
    assert sim.planes_per_band_for(N) == sim.PLANES_PER_BAND + 1
    # and stays at the floor for every driver-checked corpus size
    assert sim.planes_per_band_for(500) == sim.PLANES_PER_BAND
    assert sim.planes_per_band_for(2048) == sim.PLANES_PER_BAND


def test_adaptive_r_matches_parameterized_oracle(spark, corpus_dir):
    with pytest.warns(UserWarning, match="adaptive r=9 exceeds"):
        sdf = sim.q_ann_lsh_bucketed(spark, corpus_dir).toPandas()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/embeddings.parquet')"
    )
    odf = con.execute(sim._oracle_lsh(sim.PLANES_PER_BAND + 1)).df()
    con.close()

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(o) > 0, (len(s), len(o))
    for c in cols:
        if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
            assert (
                s[c].astype(float).round(6).equals(o[c].astype(float).round(6))
            ), f"float column {c} diverges"
        else:
            assert s[c].astype(str).equals(o[c].astype(str)), (
                f"column {c} diverges"
            )


def test_corpus_size_probe_cached(spark, corpus_dir):
    """VERDICT r04 'What's wrong' #3: the row-count probe must run at
    most once per sf_dir per process, not once per invocation."""
    sim._corpus_size(spark, corpus_dir)
    assert corpus_dir in sim._N_VECS_CACHE
    sim._N_VECS_CACHE[corpus_dir] = -12345  # poison: a re-probe would overwrite
    assert sim._corpus_size(spark, corpus_dir) == -12345
    sim._N_VECS_CACHE[corpus_dir] = N
