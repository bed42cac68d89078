#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir> [onlyQuery...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet files registered under their table names, and compares
row-count, column names, and values (rows sorted by all columns, columns
sorted by name) — mirroring a hash-based compare.

DTYPE-SENSITIVE: both sides are fetched as pandas DataFrames (`.df()`),
exactly like the driver's hasher, so a DuckDB HUGEINT (rendered by pandas
as float64: "3.0") will NOT silently compare equal to a Spark int64 ("3").
Round-1 lesson: the old fetchall()-based compare green-lit 6 queries the
driver gate redded for exactly this.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell(x):
    if x is None:
        return (True, "")
    if isinstance(x, float):
        if math.isnan(x):
            return (True, "")  # pandas renders NULL double as NaN
        return (False, repr(x))
    return (False, str(x))


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(cell(x) for x in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows), {c: str(df[c].dtype) for c in cols}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        g, gd = canon(got)
        e, ed = canon(exp)
        bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first:")
            print(f"  got {g[i]}")
            print(f"  exp {e[i]}")
            if gd != ed:
                print(f"  dtypes got {gd}")
                print(f"  dtypes exp {ed}")
            n_fail += 1
        else:
            note = ""
            if gd != ed:
                # values stringify equal but dtypes differ (e.g. int32 vs
                # int64) — today's driver hash normalizes this; warn only.
                note = f"  [dtype note: got {gd} exp {ed}]"
            print(f"PASS {name} ({len(g)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
