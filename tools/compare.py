#!/usr/bin/env python3
"""Dev-only oracle harness (mirrors the driver's DuckDB compare).

Usage: python3 tools/compare.py <sfdir> <outdir>
  1. sbt 'runMain graft.Verify <sfdir> <outdir>'
  2. python3 tools/compare.py <sfdir> <outdir>

Registers each parquet table as a DuckDB view, runs every oracle SQL from
outdir/oracle_sql.json, and diffs against the Spark-written parquet with
columns sorted by name and rows sorted — the same normalization the
driver applies before hashing. NOT part of the shipped library.

Prints a per-query oracle-seconds column and flags any oracle over
BUDGET_SEC: the r14 round artifact came back empty because four flat
curate_full-family oracles had quietly grown to 180-640 s each (DuckDB
re-evaluating inlined CTEs) and blew the driver's correctness budget.
Exit code stays 0 on budget flags (they are a warning, not a failure);
any mismatch still exits 1.
"""
import duckdb, sys, json, math, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
BUDGET_SEC = 20.0

def normalize(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return cols, sorted(rows)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failed, over_budget, times = [], [], {}
    t_start = time.time()
    for name, sql in sorted(oracle.items()):
        # time the got-parquet read and the oracle separately, and record
        # both even when a query FAILS — a slow-and-failing oracle must
        # still appear in the budget WARN / top-10 (ADVICE r15: the old
        # shape skipped timing on the continue, hiding exactly the
        # regression class this instrumentation exists to catch)
        t0 = time.time()
        err = None
        t_read = 0.0
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            t_read = time.time() - t0
            want = con.sql(sql).df()
        except Exception as e:
            err = e
        dt = time.time() - t0
        times[name] = dt
        if dt > BUDGET_SEC:
            over_budget.append(name)
        if err is not None:
            print(f"FAIL {name}: {err}  ({dt:.2f}s, got-read {t_read:.2f}s)")
            failed.append(name)
            continue
        gc, gr = normalize(got)
        wc, wr = normalize(want)
        if gc != wc:
            print(f"FAIL {name}: schema {gc} != {wc}")
            failed.append(name); continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
            failed.append(name); continue
        if gr != wr:
            bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            failed.append(name); continue
        flag = "  ** OVER ORACLE BUDGET **" if dt > BUDGET_SEC else ""
        print(f"OK   {name}: {len(gr)} rows  {dt:7.2f}s"
              f" (oracle {dt - t_read:.2f})" + flag)
    wall = time.time() - t_start
    top = sorted(times.items(), key=lambda kv: -kv[1])[:10]
    print("\nslowest oracles (compare sec, includes got-read):")
    for name, dt in top:
        print(f"  {dt:7.2f}s  {name}")
    print(f"\ncompare wall: {wall:.1f}s")
    if over_budget:
        print(f"WARNING: {len(over_budget)} oracle(s) over {BUDGET_SEC:.0f}s "
              f"budget: {', '.join(over_budget)} — the driver's correctness "
              f"step may time out (see SCALING.md oracle-cost table)")
    print(f"{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
