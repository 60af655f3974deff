#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (rows, schema-ish, values)
with the engine's parquet dumps from graft.Verify."""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL failed: {e}"))
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        bad.append((name, f"engine output unreadable: {e}"))
        continue
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        bad.append((name, f"columns differ: oracle={list(exp.columns)} got={list(got.columns)}"))
        continue
    if len(exp) != len(got):
        bad.append((name, f"row count differs: oracle={len(exp)} got={len(got)}"))
        continue
    exp_s = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    got_s = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    mismatch = None
    for c in exp.columns:
        e, g = exp_s[c], got_s[c]
        if e.dtype.kind == "f" or g.dtype.kind == "f":
            diff = (e.astype(float) - g.astype(float)).abs().max()
            if not (diff == diff) or diff > 1e-9:
                mismatch = f"col {c}: max abs diff {diff}"
                break
        else:
            neq = (e.astype(str) != g.astype(str))
            if neq.any():
                i = neq.idxmax()
                mismatch = f"col {c}: first diff at row {i}: oracle={e[i]} got={g[i]}"
                break
    if mismatch:
        bad.append((name, mismatch))
    else:
        ok.append(name)

print(f"OK ({len(ok)}): {' '.join(ok)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)
