#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet files registered under their table names, and compares
row-count, column names, and values (rows sorted by all columns, columns
sorted by name) — mirroring a hash-based compare.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(r):
        return tuple(
            (x is None, "NaN" if isinstance(x, float) and math.isnan(x)
             else str(x)) for x in (r[i] for i in order))
    return sorted((key(r) for r in rows))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            exp = con.execute(sql)
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        g, e = canon(grows, gcols), canon(erows, ecols)
        bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first:")
            print(f"  got {g[i]}")
            print(f"  exp {e[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
