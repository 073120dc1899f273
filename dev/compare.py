#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query, read the
Spark parquet result, run the oracle SQL in DuckDB over the same sf tables,
sort columns by name + rows, and compare values exactly.

Usage: dev/compare.py [sfDir] [outDir]
"""
import json, math, os, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return str(v)

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    rdir = f"{OUT}/{name}"
    if not os.path.isdir(rdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{rdir}/*.parquet'")
        gc, gr = normalize(got.columns, got.fetchall())
    except Exception as e:
        print(f"FAIL {name}: spark read: {e}"); fails += 1; continue
    try:
        exp = con.sql(sql)
        ec, er = normalize(exp.columns, exp.fetchall())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    if gc != ec:
        print(f"FAIL {name}: columns {gc} vs {ec}"); fails += 1; continue
    # Type-aware check: the driver hashes *rendered* values, and DuckDB renders
    # e.g. HUGEINT (int128, the default for sum() over integers) differently
    # from BIGINT even when the numbers are equal. Python stringification hides
    # that, so compare DuckDB result types explicitly.
    # INT32 vs INT64 both render as plain ints (driver-verified benign in r01);
    # HUGEINT does not fold into the family on purpose.
    def fold(t):
        return "INTFAM" if str(t) in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else str(t)
    gt = [fold(t) for _, t in sorted(zip(got.columns, got.types), key=lambda p: p[0])]
    et = [fold(t) for _, t in sorted(zip(exp.columns, exp.types), key=lambda p: p[0])]
    if gt != et:
        print(f"FAIL {name}: column types {gt} vs {et}"); fails += 1; continue
    if any(t == "HUGEINT" for t in et):
        print(f"FAIL {name}: oracle emits HUGEINT (cast sums to BIGINT)"); fails += 1; continue
    if len(gr) != len(er):
        print(f"FAIL {name}: rows {len(gr)} vs {len(er)}"); fails += 1; continue
    if gr != er:
        bad = next(i for i in range(len(gr)) if gr[i] != er[i])
        print(f"FAIL {name}: first diff at row {bad}:")
        print(f"   spark : {gr[bad]}")
        print(f"   oracle: {er[bad]}")
        fails += 1; continue
    print(f"OK   {name} ({len(gr)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
