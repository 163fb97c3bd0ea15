"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
on DuckDB at sf0.01, compare row count + schema + order-insensitive
values. Usage: python tools/check_contract.py [sf_dir] [query ...]"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    from decimal import Decimal

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
            continue
        if pd.api.types.is_integer_dtype(df[c]):
            # keep integers exact: float64 canonicalization would give
            # >2^53 values (e.g. 60-bit simhashes) ~1024-ulp slack and
            # could false-PASS a low-bit divergence
            df[c] = df[c].astype("int64")
            continue
        if df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and all(isinstance(v, int) for v in vals):
                df[c] = df[c].map(lambda v: None if v is None else int(v))
                continue
            if len(vals) and all(
                isinstance(v, (int, float, Decimal)) for v in vals
            ):
                df[c] = df[c].astype(float)
        if pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype(float).round(9)
        elif df[c].dtype == object:
            # container values stringify differently per engine
            # (ndarray '[1 2 3]' vs list '[1, 2, 3]') — canonicalize
            df[c] = df[c].map(
                lambda v: None
                if v is None
                else str(v.tolist() if isinstance(v, np.ndarray) else v)
            )
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ragflow_ocr_spark.spark.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must not silently check nothing and exit 0
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        print(f"known: {sorted(qs)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [no oracle]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {e}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            continue
        if not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            failures.append(name)
            print(f"FAIL  {name}: {int(bad.sum())}/{len(a)} rows differ")
            print("spark:", a[bad].head(3).to_string())
            print("oracle:", b[bad].head(3).to_string())
            continue
        print(f"OK    {name}: {len(a)} rows ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
