#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: run each
oracle_sql.json entry in DuckDB over the sf parquet tables and compare with
the Verify.scala parquet dumps (columns sorted by name, values hashed)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    spark_df = pd.read_parquet(files[0])
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fail += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fail += 1; continue
    if [str(t) for t in s.dtypes] != [str(t) for t in d.dtypes]:
        print(f"WARN {name}: dtypes {list(s.dtypes)} vs {list(d.dtypes)}")
    sv = s.astype(str).values.tolist()
    dv = d.astype(str).values.tolist()
    if sv != dv:
        bad = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at rows {bad}")
        for i in bad:
            print(f"  spark: {sv[i]}\n  duck : {dv[i]}")
        fail += 1
        continue
    print(f"OK   {name} ({len(s)} rows)")
print("ALL GREEN" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
