#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sf tables,
sorts columns by name and rows by all columns, and compares values
exactly (floats included — the driver hashes exact values, so anything
short of bit-equality after rounding is a FAIL; the first mismatching
cell is printed with both values and their absolute difference to make
rounding-step diagnosis easy).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    fa = isinstance(a, float)
    fb = isinstance(b, float)
    if fa and fb:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if (a is None) != (b is None):
        # pandas uses NaN for missing floats
        if fa and math.isnan(a) and b is None:
            return True
        if fb and math.isnan(b) and a is None:
            return True
        return False
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    ok = fail = 0
    names = sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only check (no oracle); rows={len(got)}")
            ok += 1 if len(got) > 0 else 0
            if len(got) == 0:
                print(f"FAIL {name}: zero rows")
                fail += 1
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            fail += 1
            continue
        bad = 0
        first = None
        for c in g.columns:
            gv, ev = g[c].tolist(), e[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cell_eq(a, b):
                    bad += 1
                    if first is None:
                        first = (c, i, a, b)
        if bad:
            c, i, a, b = first
            absdiff = abs(a - b) if isinstance(a, float) and isinstance(b, float) \
                and not (math.isnan(a) or math.isnan(b)) else None
            print(f"FAIL {name}: {bad} mismatched cells; "
                  f"first=({c}, row {i}, {a!r} != {b!r}, absdiff={absdiff})")
            fail += 1
        else:
            print(f"OK   {name}: rows={len(g)} cols={len(g.columns)}")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
