#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify, then
execute each oracle_sql.json entry in DuckDB over the same parquet tables
and compare (schema-insensitively: columns sorted by name, rows sorted by
all columns, values normalized) against the Spark-written parquet.

Usage: python3 tools/diffcheck.py [sfDir] [outDir]
"""
import json, math, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # BIT-EXACT by default: every oracled query is engineered for exact
        # cross-engine determinism (decimal-path sums, sequential folds,
        # integer hashes) and all 46 pass with zero float tolerance —
        # set DIFFCHECK_LOOSE=1 to fall back to 6 significant digits while
        # debugging a new query.
        if os.environ.get("DIFFCHECK_LOOSE"):
            return f"{v:.6g}"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out_rows = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out_rows

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not glob.glob(f"{pdir}/*.parquet"):
        print(f"MISS  {name}: no spark output at {pdir}")
        fail += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
        gc, gr = got.description, got.fetchall()
        want = con.execute(sql)
        wc, wr = want.description, want.fetchall()
        gcols, grows = canon([c[0] for c in gc], gr)
        wcols, wrows = canon([c[0] for c in wc], wr)
        if gcols != wcols:
            print(f"FAIL  {name}: columns {gcols} != {wcols}")
            fail += 1
        elif len(grows) != len(wrows):
            print(f"FAIL  {name}: rowcount {len(grows)} != {len(wrows)}")
            fail += 1
        elif grows != wrows:
            bad = next(i for i, (a, b) in enumerate(zip(grows, wrows)) if a != b)
            print(f"FAIL  {name}: first diff at sorted row {bad}:")
            print(f"      spark:  {grows[bad]}")
            print(f"      duckdb: {wrows[bad]}")
            fail += 1
        else:
            print(f"OK    {name}: {len(grows)} rows")
            ok += 1
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fail += 1

print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
