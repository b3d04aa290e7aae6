"""Local mirror of the driver's correctness gate: run each registered Spark
query and its DuckDB oracle on the same sf dir, compare row count, schema
(column names), and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"schema mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"rowcount: spark={len(got)} oracle={len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(np.asarray(gv).dtype, np.floating) or np.issubdtype(np.asarray(wv).dtype, np.floating):
            gv = np.asarray(gv, dtype=np.float64)
            wv = np.asarray(wv, dtype=np.float64)
            both_nan = np.isnan(gv) & np.isnan(wv)
            exact = (gv == wv) | both_nan
            if not exact.all():
                bad = int((~exact).sum())
                worst = np.nanmax(np.abs(np.where(exact, 0, gv - wv)))
                problems.append(f"col {c}: {bad} float mismatches, worst abs diff {worst:.3e}")
        else:
            if not np.array_equal(np.asarray(gv).astype(str), np.asarray(wv).astype(str)):
                bad = int((np.asarray(gv).astype(str) != np.asarray(wv).astype(str)).sum())
                i = int(np.argmax(np.asarray(gv).astype(str) != np.asarray(wv).astype(str)))
                problems.append(f"col {c}: {bad} mismatches, first at row {i}: {gv[i]!r} vs {wv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from sorting_compressed_time_series_spark.queries import ORACLES, SPARK_QUERIES
    from sorting_compressed_time_series_spark.session import get_spark

    spark = get_spark(app="check", cores=8, shuffle_partitions=8)
    con = duck_con(sf_dir)
    failures = 0
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        sql = ORACLES.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            if len(got) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(got)} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: rows={len(got)} [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
