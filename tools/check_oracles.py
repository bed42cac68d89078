#!/usr/bin/env python3
"""Compare DumpTruth TSVs against the generated DuckDB oracle SQL for the
decision-rule/codec queries (no Spark round-trip needed).
Usage: python3 tools/check_oracles.py /tmp/oracledev [rpeaks pulse media]
"""
import sys, time
import duckdb

def main():
    d = sys.argv[1]
    which = sys.argv[2:] or ["media", "rpeaks", "pulse"]
    con = duckdb.connect()
    specs = {
        "media": ("oracle_media.sql", "truth_media.tsv",
                  lambda f: (f[0], int(f[1]), int(f[2]), int(f[3]),
                             float(f[4]), int(f[5]), int(f[6]))),
        "rpeaks": ("oracle_rpeaks.sql", "truth_rpeaks.tsv",
                   lambda f: (f[0], int(f[1]), float(f[2]))),
        "pulse": ("oracle_pulse.sql", "truth_pulse.tsv",
                  lambda f: (f[0], int(f[1]), float(f[2]))),
    }
    fails = 0
    for name in which:
        sqlf, truthf, parse = specs[name]
        sql = open(f"{d}/{sqlf}").read()
        truth = [parse(l.rstrip("\n").split("\t"))
                 for l in open(f"{d}/{truthf}")]
        t0 = time.time()
        try:
            got = con.execute(sql).fetchall()
        except Exception as e:
            print(f"FAIL {name}: SQL error: {str(e)[:500]}")
            fails += 1
            continue
        dt = time.time() - t0
        got = [tuple(x) for x in got]
        if len(got) != len(truth):
            print(f"FAIL {name}: rows {len(got)} != {len(truth)} ({dt:.1f}s)")
            gs, ts = set(got), set(truth)
            for r in sorted(ts - gs)[:5]: print("  missing:", r)
            for r in sorted(gs - ts)[:5]: print("  extra:  ", r)
            fails += 1
            continue
        bad = [(a, b) for a, b in zip(sorted(got), sorted(truth)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ ({dt:.1f}s)")
            for a, b in bad[:5]:
                print("  got", a, "\n  exp", b)
            fails += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {dt:.1f}s)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
