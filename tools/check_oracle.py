#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, executes the matching oracle SQL in DuckDB
against the sf parquet tables and compares values (columns sorted by name,
rows sorted by all columns), like the driver does.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    raw = json.load(f)
# oracle_sql.json is dual-keyed ("<name>" and "<name>.parquet") so the
# driver finds a match whichever key it uses; dedupe to bare names here.
oracles = {}
for k, v in raw.items():
    name = k[: -len(".parquet")] if k.endswith(".parquet") else k
    oracles[name] = v

fails = 0
for name, sql in sorted(oracles.items()):
    got_dir = os.path.join(outdir, name + ".parquet")
    if not os.path.isdir(got_dir):
        got_dir = os.path.join(outdir, name)  # legacy layout
    if not os.path.isdir(got_dir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    got = con.sql(f"SELECT * FROM '{got_dir}/*.parquet'").df()
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {name}: column mismatch spark={gcols} oracle={ecols}")
        fails += 1
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {name}: row count spark={len(g)} oracle={len(e)}")
        fails += 1
        continue
    import pandas as pd
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12)
        print(f"PASS {name}: {len(g)} rows")
    except AssertionError as ex:
        print(f"FAIL {name}: value mismatch\n{str(ex)[:2000]}")
        # show first differing rows for debugging
        neq = (g.astype(str) != e.astype(str)).any(axis=1)
        if neq.any():
            i = neq.idxmax()
            print("spark :", g.iloc[i].to_dict())
            print("oracle:", e.iloc[i].to_dict())
        fails += 1

sys.exit(1 if fails else 0)
