#!/usr/bin/env python3
# Dev aid: mimics the driver correctness gate — runs each oracle SQL in
# DuckDB over the raw parquet tables and compares (sorted columns, sorted
# rows, exact values) against the Verify.scala parquet dumps.
# Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
import duckdb, json, glob, sys, os
sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify001'
con = duckdb.connect()
con2 = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracles = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        exp = con.sql(sql).df()
        act = con2.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        # driver-style: sort columns by name, then compare value multisets
        exp = exp.reindex(sorted(exp.columns), axis=1)
        act = act.reindex(sorted(act.columns), axis=1)
        if sorted(exp.columns) != sorted(act.columns):
            fails.append((name, f"schema: exp {sorted(exp.columns)} vs act {sorted(act.columns)}")); continue
        if len(exp) != len(act):
            fails.append((name, f"rows: exp {len(exp)} vs act {len(act)}")); continue
        exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        act_s = act.sort_values(by=list(act.columns)).reset_index(drop=True)
        import pandas as pd
        try:
            pd.testing.assert_frame_equal(exp_s, act_s, check_dtype=False, check_exact=True)
            print(f"OK    {name} ({len(exp)} rows)")
        except AssertionError as e:
            fails.append((name, str(e).split(chr(10))[0:3]))
    except Exception as e:
        fails.append((name, f"error: {e}"))
for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracled queries match")
