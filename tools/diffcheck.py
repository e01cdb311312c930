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
        grel = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
        gc, gt, gr = grel.columns, [str(t) for t in grel.types], grel.fetchall()
        wrel = con.sql(sql)
        wc, wt, wr = wrel.columns, [str(t) for t in wrel.types], wrel.fetchall()
        gcols, grows = canon(gc, gr)
        wcols, wrows = canon(wc, wr)
        gtypes = [t for _, t in sorted(zip(gc, gt))]
        wtypes = [t for _, t in sorted(zip(wc, wt))]
        if gcols != wcols:
            print(f"FAIL  {name}: columns {gcols} != {wcols}")
            fail += 1
        elif gtypes != wtypes:
            # The driver's hasher is TYPE-SENSITIVE (round 12: three oracles
            # were value-identical but returned HUGEINT where Spark wrote
            # BIGINT and went driver-red). Mirror that strictness here so a
            # type drift can never pass the local gate again.
            bad = [(c, a, b) for c, a, b in zip(gcols, gtypes, wtypes) if a != b]
            print(f"FAIL  {name}: result types differ (spark vs oracle): {bad}")
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
