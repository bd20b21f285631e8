#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle check: for each query
dumped by graft.Verify, run the oracle SQL in DuckDB over the same sf
dir, sort columns by name + rows, and compare values exactly."""
import sys, json, glob, math
import duckdb, pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
import os
for name in sorted(oracle):
    if not os.path.isdir(f"{outdir}/{name}"):
        continue  # subset dump (Verify with a name filter)
    try:
        exp = con.sql(oracle[name]).df()
        got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}"); fail += 1; continue
        exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        got = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); fail += 1; continue
        ok = True
        for c in exp.columns:
            e, g = exp[c], got[c]
            # The driver hashes value representations, so a dtype
            # divergence (e.g. DuckDB HUGEINT->float64 vs Spark BIGINT
            # ->int64) is a hash FAIL even when values compare equal
            # numerically. Round 1's q1/q12 failures were masked here
            # by the lenient float==int path; be strict.
            if e.dtype.kind != g.dtype.kind:
                print(f"FAIL {name}: col {c} dtype kind differs: exp={e.dtype} got={g.dtype}")
                ok = False; fail += 1; break
            if e.dtype.kind == 'f':
                same = ((e.isna() & g.isna()) | (e == g)).all()
            else:
                same = (e.astype(str).fillna('<NA>') == g.astype(str).fillna('<NA>')).all()
            if not same:
                bad = (~((e.isna() & g.isna()) | (e.astype(str) == g.astype(str)))).idxmax()
                print(f"FAIL {name}: col {c} differs, e.g. row {bad}: exp={e[bad]!r} got={g[bad]!r}")
                ok = False; fail += 1; break
        if ok:
            print(f"ok   {name} ({len(exp)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {ex}"); fail += 1
sys.exit(1 if fail else 0)
