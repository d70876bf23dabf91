#!/usr/bin/env python3
"""Chunked sf1 oracle sweep: run every oracle_sql.json entry in its OWN
DuckDB subprocess with a memory limit, a dedicated spill dir, and a wall
timeout — so one super-linear oracle can neither OOM the sweep nor fill
the disk, and the sweep records a per-query cost table instead of dying.

Usage: tools/sf1_oracle_sweep.py SF_DIR OUT_DIR [--timeout SEC] [--mem GB]
       [--only name1,name2] [--report PATH]

Writes PASS/FAIL/TIMEOUT/ERROR per query plus seconds to stdout and a
JSON cost table to --report (default OUT_DIR/oracle_costs.json).
"""
import argparse, glob, json, os, shutil, subprocess, sys, tempfile, time

RUNNER = r'''
import sys, json, glob
import duckdb
import pandas as pd
sf_dir, out_dir, name, spill, mem_gb = sys.argv[1:6]
con = duckdb.connect()
con.execute(f"SET memory_limit='{mem_gb}GB'")
con.execute(f"SET temp_directory='{spill}'")
import os
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
files = glob.glob(f"{out_dir}/{name}/*.parquet")
if not files:
    print("NOSPARK"); sys.exit(3)
spark_df = pd.read_parquet(files[0])
duck_df = con.execute(sql).df()
s = spark_df[sorted(spark_df.columns)]
d = duck_df[sorted(duck_df.columns)]
if list(s.columns) != list(d.columns):
    print("COLS", list(s.columns), list(d.columns)); sys.exit(4)
if len(s) != len(d):
    print("ROWS", len(s), len(d)); sys.exit(5)
if s.astype(str).values.tolist() != d.astype(str).values.tolist():
    print("HASH"); sys.exit(6)
print("OK", len(s))
'''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--mem", type=float, default=48.0)
    ap.add_argument("--only", default="")
    ap.add_argument("--report", default="")
    args = ap.parse_args()

    oracle = json.load(open(f"{args.out_dir}/oracle_sql.json"))
    names = sorted(oracle)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    report = args.report or f"{args.out_dir}/oracle_costs.json"
    results = {}
    fails = 0
    for i, name in enumerate(names):
        spill = tempfile.mkdtemp(prefix=f"duck-{name}-")
        t0 = time.time()
        status = "PASS"
        try:
            p = subprocess.run(
                [sys.executable, "-c", RUNNER, args.sf_dir, args.out_dir,
                 name, spill, str(args.mem)],
                capture_output=True, text=True, timeout=args.timeout)
            if p.returncode != 0:
                status = "FAIL"
                fails += 1
        except subprocess.TimeoutExpired:
            p = None
            status = "TIMEOUT"
            fails += 1
        dt = time.time() - t0
        shutil.rmtree(spill, ignore_errors=True)
        detail = (p.stdout.strip() + " " + p.stderr.strip()[-200:]).strip() if p else ""
        results[name] = {"status": status, "sec": round(dt, 1),
                         "detail": detail[:300]}
        print(f"[{i+1}/{len(names)}] {status:7s} {dt:8.1f}s  {name}"
              + ("" if status == "PASS" else f"  {detail[:160]}"), flush=True)
        # Refresh the cost table as we go so a killed sweep still reports.
        with open(report, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print(("ALL GREEN" if fails == 0 else f"{fails} NOT PASSING")
          + f" — cost table: {report}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
