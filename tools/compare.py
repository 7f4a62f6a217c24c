#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB over the same sf dir and compares against the Verify parquet dumps
(columns sorted by name, rows sorted, exact value compare)."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    try:
        got = pd.read_parquet(path)
    except Exception as e:
        results[name] = f"READ_FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows_only rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE_SQL_FAIL {e}"
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        results[name] = f"COLS_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        continue
    if len(g) != len(e):
        results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
        continue
    g = g.sort_values(by=list(g.columns), na_position="first").reset_index(drop=True)
    e = e.sort_values(by=list(e.columns), na_position="first").reset_index(drop=True)
    # normalize dtypes for compare
    mismatch = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if str(gv.dtype).startswith("datetime") or str(ev.dtype).startswith("datetime"):
                gv = pd.to_datetime(gv).astype("datetime64[us]")
                ev = pd.to_datetime(ev).astype("datetime64[us]")
            eq = (gv.isna() & ev.isna()) | (gv == ev)
            if not eq.all():
                bad = (~eq).idxmax()
                mismatch = f"VALUE col={c} row={bad} got={gv[bad]!r} exp={ev[bad]!r} dtype g={g[c].dtype} e={e[c].dtype}"
                break
        except Exception as ex:
            mismatch = f"CMP_FAIL col={c}: {ex} (dtypes {g[c].dtype} vs {e[c].dtype})"
            break
    results[name] = mismatch or f"OK rows={len(g)}"

fails = {k: v for k, v in results.items() if not v.startswith(("OK", "rows_only"))}
for k in sorted(results):
    print(f"{k:24s} {results[k]}")
print(f"\n{len(results) - len(fails)}/{len(results)} pass; {len(fails)} fail")
sys.exit(1 if fails else 0)
