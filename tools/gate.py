#!/usr/bin/env python3
"""Dev-side correctness gate: replays the driver's DuckDB compare locally.

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout [name ...]"
  python3 tools/gate.py /root/testdata/sf0.01 /tmp/vout [name ...]

For each dumped query result (parquet under <outDir>/<name>/) with an
entry in oracle_sql.json, runs the oracle SQL in DuckDB over the same
parquet tables and compares row count, schema (column names sorted), and
values (columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings", "partsupp"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stable total sort: round true floats first so two engines' values
    # that are equal within tolerance stringify (and thus sort) the same
    # way — otherwise rows land in different positions and values_match
    # compares misaligned rows
    key = df.copy()
    for c in key.columns:
        if pd.api.types.is_float_dtype(key[c]):
            key[c] = key[c].round(6)
    key = key.astype(str)
    order = key.sort_values(by=list(key.columns)).index
    return df.loc[order].reset_index(drop=True)


def values_match(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    import numpy as np
    if a.shape != b.shape:
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        # integers compare EXACTLY: 64-bit hash/ID columns (simhash,
        # xxhash64) lose precision above 2^53 as floats and isclose's
        # relative tolerance would admit ~1e9 absolute drift on them
        if pd.api.types.is_integer_dtype(x) and pd.api.types.is_integer_dtype(y):
            # python-int compare: dtype-width agnostic (int32 vs int64,
            # uint64) and never routed through float
            if not (x.isna().to_numpy() == y.isna().to_numpy()).all():
                return False
            if not all(int(u) == int(v)
                       for u, v in zip(x.dropna(), y.dropna())):
                return False
            continue
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            xa, ya = x.astype(float), y.astype(float)
            both_nan = xa.isna() & ya.isna()
            if not (both_nan | np.isclose(xa, ya, rtol=1e-9, atol=1e-12,
                                          equal_nan=False)).all():
                return False
            continue
        if not (x.astype(str) == y.astype(str)).all():
            return False
    return True


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"{name}: NO DUMP")
            bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        want = con.execute(sql).df()
        g, w = canon(got), canon(want)
        rows = len(g) == len(w)
        schema = list(g.columns) == list(w.columns)
        vals = rows and schema and values_match(g, w)
        # the driver's hash is dtype-sensitive across the int/float line:
        # a DuckDB HUGEINT (SUM, //) lands in pandas as float64 and
        # hash-mismatches a Spark long even when every value is equal.
        # Catch that here so it never reaches the driver.
        dtype_bad = []
        if schema:
            for c in g.columns:
                gi = pd.api.types.is_integer_dtype(g[c])
                wi = pd.api.types.is_integer_dtype(w[c])
                gf = pd.api.types.is_float_dtype(g[c])
                wf = pd.api.types.is_float_dtype(w[c])
                if (gi and wf) or (gf and wi):
                    dtype_bad.append(f"{c}:{g[c].dtype}vs{w[c].dtype}")
        status = "OK" if (rows and schema and vals and not dtype_bad) else \
            f"FAIL rows={rows} schema={schema} vals={vals} dtype={dtype_bad} " \
            f"({len(g)} vs {len(w)}; cols {list(g.columns)} vs {list(w.columns)})"
        print(f"{name}: {status}")
        if status != "OK":
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
