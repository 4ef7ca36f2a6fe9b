#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare rows/schema/values against the
Spark parquet dumps produced by graft.Verify. Columns compared name-sorted,
values exact."""
import sys, json, glob, duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
    if len(odf) != len(sdf):
        fails.append((name, f"rows spark={len(sdf)} oracle={len(odf)}")); continue
    so, oo = sorted(sdf.columns), sorted(odf.columns)
    if so != oo:
        fails.append((name, f"cols spark={so} oracle={oo}")); continue
    sdf, odf = sdf[so].reset_index(drop=True), odf[so].reset_index(drop=True)
    bad = None
    for c in so:
        a, b = sdf[c], odf[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
            else:
                eq = (a.astype(str).values == b.astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad = f"col {c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                break
        except Exception as e:
            bad = f"col {c} compare error: {e}"; break
    if bad: fails.append((name, bad))
    else: passes.append(name)

print(f"PASS {len(passes)}/{len(oracle)}: {' '.join(passes)}")
for n, why in fails: print(f"FAIL {n}: {why}")
sys.exit(1 if fails else 0)
