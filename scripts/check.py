#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet in <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (tables = views over the
same parquet files) and compares: row count, column names (sorted),
and cell values with columns sorted by name (mimics the driver's
sort-columns-then-hash compare). Exit code = number of mismatches.

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import json, os, sys
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

with open(os.path.join(out_dir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)

    def cell(v, is_dt=False):
        if isinstance(v, float):
            if v == 0:           # normalize -0.0 vs 0.0
                v = 0.0
            return f"{v:.6f}"
        s = str(v)
        # DATE-vs-TIMESTAMP dtype renderings: midnight timestamps and
        # dates must canonicalize identically — but ONLY for datetime
        # columns: a STRING cell genuinely ending in " 00:00:00" must
        # not silently compare equal to its prefix.
        if is_dt and s.endswith(" 00:00:00"):
            return s[:-9]
        return s

    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        is_dt = pd.api.types.is_datetime64_any_dtype(df[c])
        out[c] = df[c].map(lambda v: cell(v, is_dt))
    return out

fails = 0
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
for name in names:
    got = pd.read_parquet(os.path.join(out_dir, name))
    if name not in oracles:
        print(f"{name:28s} rows-only: {len(got)} rows (no oracle)")
        continue
    try:
        exp = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    gc, ec = canon(got), canon(exp)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"{name:28s} COLUMN MISMATCH spark={sorted(got.columns)} duck={sorted(exp.columns)}")
        fails += 1
    elif len(gc) != len(ec):
        print(f"{name:28s} ROWCOUNT MISMATCH spark={len(gc)} duck={len(ec)}")
        fails += 1
    elif not gc.equals(ec):
        diff = (gc != ec).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"{name:28s} VALUE MISMATCH ({diff.sum()} rows); first diffs:")
        for i in idx:
            print(f"  row {i}: spark={gc.loc[i].to_dict()}")
            print(f"  row {i}:  duck={ec.loc[i].to_dict()}")
        fails += 1
    else:
        print(f"{name:28s} OK ({len(gc)} rows)")

missing = sorted(set(oracles) - set(names))
for m in missing:
    print(f"{m:28s} NO RESULT PARQUET (query failed?)")
    fails += 1
print(f"\n{len(names)} queries, {fails} failures")
sys.exit(min(fails, 120))
