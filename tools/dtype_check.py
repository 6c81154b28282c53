#!/usr/bin/env python3
"""Driver-hasher mirror: compares pandas DTYPES and a dtype-sensitive hash.

The driver reaches pandas by two different paths (spark parquet via
pyarrow.to_pandas, oracle via duckdb .df()), sorts with sort_values on all
columns, and hashes values dtype-sensitively. compare.py checks VALUES
exactly; this tool checks the representation contract.

OVER-APPROXIMATION CAVEAT (measured against CORRECTNESS_r12): this tool's
dtype equality is STRICTER than the driver's hasher. Queries that were
driver-green in r12 still flag here on (a) datetime64[us] vs [ns] (duckdb
.df() gives us, pyarrow ns) and (b) int32 vs int64 width when both sides
are integral — the driver evidently normalizes both. The classes that DID
break the driver — decimal128 vs int, and list<> columns (unsortable) —
are exactly what a flag here must be taken seriously for. Treat timestamp
and int-width flags as informational unless the driver disagrees.
"""
import duckdb, json, sys
import pandas as pd
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
outdir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
names = sys.argv[3:]

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f'{outdir}/oracle_sql.json'))
ok, bad = [], []
for name, sql in sorted(oracles.items()):
    if names and name not in names:
        continue
    try:
        exp = con.execute(sql).df()
        got = pq.read_table(f'{outdir}/{name}').to_pandas()
        ecols, gcols = sorted(exp.columns), sorted(got.columns)
        if list(ecols) != list(gcols):
            bad.append((name, f"schema: oracle={list(ecols)} spark={list(gcols)}")); continue
        exp = exp[ecols].sort_values(by=list(ecols)).reset_index(drop=True)
        got = got[gcols].sort_values(by=list(gcols)).reset_index(drop=True)
        dt_mismatch = [(c, str(exp[c].dtype), str(got[c].dtype))
                       for c in ecols if str(exp[c].dtype) != str(got[c].dtype)]
        if dt_mismatch:
            bad.append((name, f"dtype: {dt_mismatch}")); continue
        he = pd.util.hash_pandas_object(exp, index=False).sum()
        hg = pd.util.hash_pandas_object(got, index=False).sum()
        if he != hg:
            # find first differing cell for the report
            diff = None
            for c in ecols:
                ne = exp[c] != got[c]
                if getattr(exp[c].dtype, 'kind', '') == 'f':
                    ne = ne & ~(exp[c].isna() & got[c].isna())
                if ne.any():
                    i = ne.idxmax(); diff = (i, c, exp[c][i], got[c][i]); break
            bad.append((name, f"hash: first diff {diff}")); continue
        ok.append((name, len(exp)))
    except Exception as ex:
        bad.append((name, f"EXC: {type(ex).__name__}: {ex}"))

for n, r in ok: print(f"OK   {n} ({r} rows)")
for n, why in bad: print(f"FAIL {n}: {why}")
print(f"\n{len(ok)} ok, {len(bad)} fail")
sys.exit(1 if bad else 0)
