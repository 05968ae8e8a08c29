#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify.scala parquet
dumps (columns sorted by name, values hashed row-by-row)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    got = pd.read_parquet(path)
    got = got[sorted(got.columns)]
    if name not in oracle:
        results[name] = f"rows-only: {len(got)} rows" + (" [EMPTY!]" if len(got) == 0 else "")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"
        continue
    exp = exp[sorted(exp.columns)]
    # normalize datetime64 resolution (ns vs us is a host-side artifact)
    for df in (got, exp):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLUMN MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        results[name] = (f"DTYPE MISMATCH got={got.dtypes.to_dict()} exp={exp.dtypes.to_dict()}")
        # fallthrough to value compare anyway
    if len(got) != len(exp):
        results[name] = f"ROWCOUNT MISMATCH got={len(got)} exp={len(exp)}"
        continue
    try:
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp.reset_index(drop=True),
                                      check_dtype=False, check_exact=True)
        ok = results.get(name, "OK")
        results[name] = "OK" if ok == "OK" or not ok.startswith("DTYPE") else ok + " (values OK)"
    except AssertionError as e:
        msg = str(e).split("\n")[0:3]
        results[name] = "VALUE MISMATCH: " + " | ".join(msg)

n_ok = sum(1 for v in results.values() if v == "OK")
for k, v in sorted(results.items()):
    flag = "PASS" if v == "OK" else "????"
    print(f"{flag} {k}: {v}")
print(f"\n{n_ok}/{len(results)} exact-match")
