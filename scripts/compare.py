#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 scripts/compare.py /tmp/verify_out /root/testdata/sf0.01

For each <out>/<name> parquet dir with an entry in oracle_sql.json:
run the oracle in DuckDB against the sf tables, sort columns by name,
and compare the full value matrix exactly (floats exact — the queries
are expected to round).
"""
import sys, json, glob, os
import duckdb

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    rdir = f"{out}/{name}"
    if not os.path.isdir(rdir):
        print(f"MISSING {name}"); fails += 1; continue
    try:
        mine = con.execute(f"SELECT * FROM '{rdir}/*.parquet'").fetchdf()
        ref = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR   {name}: {str(e).splitlines()[0][:120]}"); fails += 1; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"SCHEMA  {name}: mine={list(mine.columns)} ref={list(ref.columns)}"); fails += 1; continue
    if len(mine) != len(ref):
        print(f"ROWS    {name}: mine={len(mine)} ref={len(ref)}"); fails += 1; continue
    mv = sorted(map(str, mine.itertuples(index=False, name=None)))
    rv = sorted(map(str, ref.itertuples(index=False, name=None)))
    if mv != rv:
        diff = [(a, b) for a, b in zip(mv, rv) if a != b][:3]
        print(f"VALUES  {name}: first diffs {diff}"); fails += 1; continue
    print(f"OK      {name} ({len(mine)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} green")
sys.exit(1 if fails else 0)
