#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential oracle.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <outDir>/oracle_sql.json, registers every parquet table in <sfDir>
as a DuckDB view, runs each oracle, and compares against the Spark result
parquet written by graft.Verify (columns sorted by name, row order as
produced). Exits non-zero on any mismatch.

Driver-side tooling only (duckdb/pyarrow are not available to the engine
itself).
"""
import sys, os, glob, json, math
import duckdb
import pyarrow.parquet as pq
from datetime import datetime, date
from decimal import Decimal


def norm(v):
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return ("b", v.hex())
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failed = []
    only = sys.argv[3:] or None
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1; failed.append(name)
            continue
        try:
            spark_tbl = pq.read_table(files[0])
            spark_cols = sorted(spark_tbl.column_names)
            spark_rows = [tuple(norm(r[c]) for c in spark_cols)
                          for r in spark_tbl.to_pylist()]
            duck = con.sql(sql)
            duck_cols_raw = duck.columns
            duck_rows_raw = duck.fetchall()
            order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
            duck_cols = [duck_cols_raw[i] for i in order]
            duck_rows = [tuple(norm(r[i]) for i in order) for r in duck_rows_raw]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1; failed.append(name)
            continue
        if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_fail += 1; failed.append(name)
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1; failed.append(name)
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            i, a, b = bad
            print(f"FAIL {name}: row {i}\n  spark={a}\n  duck ={b}")
            n_fail += 1; failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    # queries without oracles: rows-only check. A registered query with no
    # output at all (crashed in Verify) is a FAILURE, not a silent skip.
    manifest_path = f"{out_dir}/queries.json"
    manifest = json.load(open(manifest_path)) if os.path.exists(manifest_path) else []
    seen_dirs = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out_dir}/*/")}
    for name in sorted(set(manifest) | seen_dirs):
        if name in oracle or (only and name not in only):
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: registered query produced no output")
            n_fail += 1; failed.append(name)
            continue
        nrows = sum(pq.read_table(f).num_rows for f in files)
        print(f"ROWS {name}: {nrows}")
    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {failed}" if failed else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
