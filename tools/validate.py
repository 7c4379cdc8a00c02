#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then for
each query compare its parquet output against the DuckDB oracle on the same
testdata tables (row count, column names, sorted values)."""
import duckdb, glob, json, math, os, subprocess, sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
RUN_VERIFY = os.environ.get("SKIP_VERIFY", "") != "1"

if RUN_VERIFY:
    subprocess.run(["sbt", "-batch", f"runMain graft.Verify {SF_DIR} {OUT}"],
                   cwd="/root/repo", check=True, capture_output=True)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{SF_DIR}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 restricts both Verify and compare
only = {n.strip() for n in os.environ.get("SPARK_GRAFT_ONLY", "").split(",") if n.strip()}
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.9g}"
    return str(v)

fails, passes = [], []
for name in sorted(oracle):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        got = con.sql(f"SELECT * FROM parquet_scan('{OUT}/{name}/*.parquet')").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"sql error: {e}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"columns differ: spark={gc} oracle={ec}")); continue
    g = sorted(tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False))
    e = sorted(tuple(norm(v) for v in row) for row in exp[gc].itertuples(index=False))
    if len(g) != len(e):
        fails.append((name, f"rows differ: spark={len(g)} oracle={len(e)}")); continue
    if g != e:
        diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
        fails.append((name, f"values differ, first diffs: {diff}")); continue
    passes.append((name, len(g)))

for n, r in passes: print(f"PASS {n} ({r} rows)")
for n, msg in fails: print(f"FAIL {n}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
