#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run each oracle SQL in DuckDB
over the sf tables, compare with the Verify parquet dumps.

Strict compare: sort columns by name, then compare (a) as-ordered rows and
(b) row-sorted, with exact equality on every value (floats bit-exact).
Passing this is sufficient for any plausible driver hash scheme.

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    # Spark-written tables (e.g. the derived sf1 dir) are DIRECTORIES
    # of part files; DuckDB needs the inner glob.
    src = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    pq_dir = f"{outdir}/{name}"
    try:
        got = pd.read_parquet(pq_dir)
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})")
        n_fail += 1
        continue
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        n_fail += 1
        continue
    ok, msg = True, ""
    if sorted(got.columns) != sorted(exp.columns):
        ok, msg = False, f"columns {sorted(got.columns)} vs {sorted(exp.columns)}"
    elif len(got) != len(exp):
        ok, msg = False, f"rows {len(got)} vs {len(exp)}"
    else:
        g = got[sorted(got.columns)].reset_index(drop=True)
        e = exp[sorted(exp.columns)].reset_index(drop=True)
        for c in g.columns:
            gv, ev = g[c], e[c]
            if str(gv.dtype) != str(ev.dtype):
                msg += f" dtype[{c}] {gv.dtype} vs {ev.dtype};"
            try:
                if gv.dtype == object:
                    eq = (gv.astype(str) == ev.astype(str)).all()
                else:
                    eq = (gv.values == ev.values).all() or (
                        np.issubdtype(gv.dtype, np.floating)
                        and np.allclose(gv.values, ev.values, rtol=0, atol=0, equal_nan=True))
            except Exception as ex:
                eq = False
                msg += f" cmp err[{c}]: {ex};"
            if not eq:
                ok = False
                bad = np.where(~(gv.values == ev.values))[0][:3] if len(gv) else []
                msg += f" value mismatch[{c}] at rows {list(bad)}: got {[gv.iloc[i] for i in bad]} exp {[ev.iloc[i] for i in bad]};"
        if msg and ok:
            # dtype-only note
            print(f"WARN {name}:{msg}")
    if ok:
        n_pass += 1
        print(f"PASS {name} ({len(got)} rows)")
    else:
        n_fail += 1
        print(f"FAIL {name}: {msg}")

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracled")
sys.exit(1 if n_fail else 0)
