#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify via sbt first,
then this script compares each dumped parquet against the DuckDB oracle SQL.

Usage: python3 tools/check_oracle.py [sfdir] [outdir] [names...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
# a requested name missing from the dump is a FAILURE, not a skip —
# otherwise a stale outdir silently yields a vacuous "ALL OK"
for name in sorted(only - set(oracle)):
    print(f"FAIL {name}: not in oracle_sql.json (stale outdir?)")
    fails += 1
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    # driver semantics: sort columns by name, then compare values
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    eq = True
    for c in got.columns:
        a, b = got[c], exp[c]
        # The driver's hash is TYPE-sensitive: DuckDB HUGEINT lands as
        # float64 and hashes differently from Spark's int64 even when every
        # value is identical (bit us on q12_late_priority / sync_rollover in
        # round 4). Flag int-vs-float kind skew as a failure BEFORE the
        # value-level comparison so the local gate matches driver semantics.
        # (Object-dtype columns are exempt: pandas reads e.g. decimals and
        # strings as 'O' on one side only, which the value loop handles.)
        kinds = {a.dtype.kind, b.dtype.kind}
        if len(kinds) > 1 and kinds <= {'i', 'u', 'f', 'b'}:
            print(f"FAIL {name}: col {c} dtype skew spark={a.dtype} "
                  f"oracle={b.dtype} (driver hash is type-sensitive; "
                  f"CAST the oracle to BIGINT/DOUBLE to match)")
            eq = False
            continue
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                ok = ((a.isna() & b.isna()) | (a.astype(str) == b.astype(str))).all()
        except Exception as e:
            ok = False
        if not ok:
            eq = False
            bad = (a.astype(str) != b.astype(str))
            idx = bad[bad].index[:3]
            print(f"FAIL {name}: col {c} differs, e.g. rows {list(idx)}:")
            for i in idx:
                print(f"   spark={a[i]!r} oracle={b[i]!r}")
    if eq:
        print(f"OK   {name} ({len(got)} rows)")
    else:
        fails += 1
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
