#!/usr/bin/env python3
"""Dev-only oracle harness (mirrors the driver's DuckDB compare).

Usage: python3 tools/compare.py <sfdir> <outdir>
  1. sbt 'runMain graft.Verify <sfdir> <outdir>'
  2. python3 tools/compare.py <sfdir> <outdir>

Registers each parquet table as a DuckDB view, runs every oracle SQL from
outdir/oracle_sql.json, and diffs against the Spark-written parquet with
columns sorted by name and rows sorted — the same normalization the
driver applies before hashing. NOT part of the shipped library.
"""
import duckdb, sys, json, math

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

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
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
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
        print(f"OK   {name}: {len(gr)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
