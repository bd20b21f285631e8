#!/usr/bin/env python3
"""Dev-loop oracle compare: mimic the driver's DuckDB check.

Usage: python3 dev/compare.py OUTDIR SFDIR [name ...]
Reads OUTDIR/<name>/ parquet (Spark result) + OUTDIR/oracle_sql.json,
runs each oracle SQL in DuckDB over SFDIR tables, compares rows
(columns sorted by name, values rounded like a hash would see them).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    return str(v)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sql = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")
    if not names:
        names = sorted(n.split("/")[-1] for n in glob.glob(f"{outdir}/*") if not n.endswith(".json"))
    fails = 0
    for name in names:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        if name not in sql:
            print(f"{name}: no oracle (rows-only)"); continue
        s_rows = con.execute(f"SELECT * FROM parquet_scan('{files[0]}')").fetchall()
        s_cols = [d[0] for d in con.description]
        try:
            o_rows = con.execute(sql[name]).fetchall()
            o_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}"); fails += 1; continue
        s_ix = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        o_ix = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        if sorted(s_cols) != sorted(o_cols):
            print(f"{name}: SCHEMA {sorted(s_cols)} vs {sorted(o_cols)}"); fails += 1; continue
        sn = sorted(tuple(norm(r[i]) for i in s_ix) for r in s_rows)
        on = sorted(tuple(norm(r[i]) for i in o_ix) for r in o_rows)
        if len(sn) != len(on):
            print(f"{name}: ROWS {len(sn)} vs {len(on)}"); fails += 1; continue
        if sn != on:
            bad = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"{name}: HASH MISMATCH e.g. {bad}"); fails += 1; continue
        print(f"{name}: ok ({len(sn)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
