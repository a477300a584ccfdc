#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running oracle_sql.json over the same tables.

Usage: python3 dev/check_oracle.py [outDir] [sfDir] [query...]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        exp = con.execute(sql).fetchdf()
        got = pd.read_parquet(f"{out_dir}/{name}")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: {type(e).__name__}: {e}"); continue
    # driver-style: sort columns by name, then compare
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append(name)
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        continue
    if len(exp) != len(got):
        fails.append(name)
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        continue
    # row order should already be deterministic; compare positionally, exact
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == 'f' or g.dtype.kind == 'f':
            ef, gf = e.astype(float), g.astype(float)
            eq = (ef.values == gf.values) | (ef.isna().values & gf.isna().values)
            if not eq.all():
                d = np.nanmax(np.abs(ef.values - gf.values))
                bad.append(f"{c} (maxdiff={d:.3e}, n={int((~eq).sum())})")
        elif str(e.dtype).startswith('datetime') or str(g.dtype).startswith('datetime'):
            ev = pd.to_datetime(e).astype('datetime64[us]')
            gv = pd.to_datetime(g).astype('datetime64[us]')
            if not (ev.values == gv.values).all():
                bad.append(f"{c} (datetime mismatch)")
        else:
            ev, gv = e.astype(str), g.astype(str)
            if not (ev.values == gv.values).all():
                i = int(np.argmax(ev.values != gv.values))
                bad.append(f"{c} (first@{i}: exp={ev.values[i]!r} got={gv.values[i]!r})")
    if bad:
        fails.append(name)
        print(f"FAIL {name}: {', '.join(bad)}")
    else:
        print(f"ok   {name} ({len(exp)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle) if not only else len(only)} passed")
sys.exit(1 if fails else 0)
