#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare to the Verify parquet dumps
(column-name-sorted, value-compared)."""
import duckdb, json, sys, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    pq = f'{outdir}/{name}'
    if not os.path.isdir(pq):
        print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f'{name}: ORACLE SQL ERROR: {e}'); fails.append(name); continue
    act = con.execute(f"SELECT * FROM parquet_scan('{pq}/*.parquet')").fetchdf()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    act = act.reindex(sorted(act.columns), axis=1)
    if list(exp.columns) != list(act.columns):
        print(f'{name}: COLUMN MISMATCH exp={list(exp.columns)} act={list(act.columns)}'); fails.append(name); continue
    if len(exp) != len(act):
        print(f'{name}: ROWCOUNT exp={len(exp)} act={len(act)}'); fails.append(name); continue
    # order-insensitive compare: sort by all columns
    cols = list(exp.columns)
    e = exp.sort_values(cols).reset_index(drop=True)
    a = act.sort_values(cols).reset_index(drop=True)
    same = e.equals(a)
    if not same:
        # tolerate dtype diffs: compare as strings
        same = e.astype(str).equals(a.astype(str))
    if same:
        print(f'{name}: OK ({len(exp)} rows)')
    else:
        print(f'{name}: VALUE MISMATCH')
        diff = (e.astype(str) != a.astype(str)).any(axis=1)
        print('first diffs (expected vs actual):')
        print(e[diff].head(3))
        print(a[diff].head(3))
        fails.append(name)

nocheck = [os.path.basename(p) for p in glob.glob(f'{outdir}/*') if os.path.isdir(p) and os.path.basename(p) not in oracle]
print('\nrows-only (no oracle):', sorted(nocheck))
for n in sorted(nocheck):
    c = con.execute(f"SELECT count(*) FROM parquet_scan('{outdir}/{n}/*.parquet')").fetchone()[0]
    print(f'  {n}: {c} rows')
print('\nFAILED:' if fails else '\nALL ORACLES PASS', fails if fails else '')
sys.exit(1 if fails else 0)
