#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_parity.py [SF_DIR] [VERIFY_OUT]

Reads VERIFY_OUT/<name>/ parquet (written by graft.Verify) and
VERIFY_OUT/oracle_sql.json, runs each oracle in DuckDB against the same
SF_DIR tables, then compares: columns sorted by name, rows sorted by all
columns, exact value match (floats compared to 1e-9 after both sides
round identically in-query).
"""
import duckdb
import glob
import json
import math
import os
import sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if (a is None) != (b is None):
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    except TypeError:
        pass
    return str(a) == str(b)

fails = 0
names = sorted(set(list(oracle.keys()) +
                   [os.path.basename(p) for p in glob.glob(os.path.join(OUT, "*"))
                    if os.path.isdir(p)]))
for name in names:
    pq = os.path.join(OUT, name)
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no Spark output dir")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM '{pq}/*.parquet'").df()
    if name not in oracle:
        print(f"ROWS-ONLY {name}: {len(got)} rows" + (" (EMPTY!)" if len(got) == 0 else ""))
        if len(got) == 0:
            fails += 1
        continue
    try:
        rel = con.sql(oracle[name])
        # oracle-type lint: DuckDB sum(INTEGER) returns HUGEINT, which
        # pandas renders float64 → the driver's value hash sees 996797.0
        # vs Spark's 996797 and fails despite identical values. Any
        # HUGEINT column means a missing CAST(... AS BIGINT) in the
        # oracle SQL — fail loudly here, at dev time.
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"FAIL {name}: oracle columns {huge} are HUGEINT "
                  f"(add CAST(... AS BIGINT) — driver hash would differ)")
            fails += 1
            continue
        exp = rel.df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
        fails += 1
        continue
    # dtype-kind lint: int-vs-float between the two sides hashes
    # differently in the driver even when values are numerically equal
    kind_bad = [c for c in g.columns
                if g[c].dtype.kind in "if" and e[c].dtype.kind in "if"
                and (g[c].dtype.kind == "f") != (e[c].dtype.kind == "f")]
    if kind_bad:
        print(f"FAIL {name}: int/float dtype mismatch on {kind_bad} "
              f"(spark={[str(g[c].dtype) for c in kind_bad]}, "
              f"duck={[str(e[c].dtype) for c in kind_bad]})")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        fails += 1
        continue
    bad = None
    for col in g.columns:
        gv, ev = g[col].tolist(), e[col].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            ana = a is None or (isinstance(a, float) and math.isnan(a))
            bna = b is None or (isinstance(b, float) and math.isnan(b))
            if ana and bna:
                continue
            if ana != bna or not cell_eq(a, b):
                bad = (col, i, a, b)
                break
        if bad:
            break
    if bad:
        col, i, a, b = bad
        print(f"FAIL {name}: first diff at row {i} col {col}: spark={a!r} duck={b!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows x {len(g.columns)} cols")

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'} ({len(names)} queries)")
sys.exit(1 if fails else 0)
