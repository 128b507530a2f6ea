#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same sfDir
tables, sorts columns by name, and compares row-by-row.
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    # Driver contract: the oracle key IS the result directory name
    # ("<query>.parquet"). No suffix fallbacks here — if the key doesn't
    # name an existing output dir, the driver would report no_oracle, so
    # we must fail loudly on the exact same condition.
    rdir = f"{out}/{name}"
    if not os.path.isdir(rdir):
        print(f"FAIL {name}: no spark output at {rdir}"); fails += 1; continue
    try:
        got = pd.read_parquet(rdir)
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    ok = True
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            # Driver's hash is dtype-sensitive across int-vs-float: DuckDB
            # HUGEINT (integer SUM/count_if) lands as float64 while Spark
            # writes int64 — numerically equal values still hash-mismatch
            # there. Mirror that strictly so local green predicts driver
            # green (int32-vs-int64 does normalize; only kind matters).
            ka, kb = a.dtype.kind, b.dtype.kind
            if (ka in 'iu' and kb == 'f') or (kb in 'iu' and ka == 'f'):
                print(f"FAIL {name}.{c}: dtype kind mismatch {a.dtype} vs {b.dtype} "
                      f"(driver hash is int-vs-float sensitive)"); ok = False
                continue
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af, bf = a.astype(float).values, b.astype(float).values
                m = ~(np.isnan(af) & np.isnan(bf))
                if not np.array_equal(af[m], bf[m]):
                    mx = np.nanmax(np.abs(af - bf))
                    print(f"FAIL {name}.{c}: maxdiff={mx}"); ok = False
            elif str(a.dtype).startswith('datetime') or str(b.dtype).startswith('datetime'):
                if not (pd.to_datetime(a.values).astype('datetime64[us]') ==
                        pd.to_datetime(b.values).astype('datetime64[us]')).all():
                    print(f"FAIL {name}.{c}: timestamp mismatch"); ok = False
            else:
                av = a.astype(object).where(pd.notna(a), None).values
                bv = b.astype(object).where(pd.notna(b), None).values
                neq = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y and not (x is None and y is None)]
                if neq:
                    i = neq[0]
                    print(f"FAIL {name}.{c}: {len(neq)} diffs, first row {i}: {av[i]!r} vs {bv[i]!r}"); ok = False
        except Exception as e:
            print(f"FAIL {name}.{c}: compare error {e}"); ok = False
    if ok:
        print(f"PASS {name} ({len(got)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
