#!/usr/bin/env python3
"""Local pre-commit oracle check, mirroring the driver's compare:
run `sbt "runMain graft.Verify <sfDir> <outDir>"` first, then this script
registers the parquet tables in DuckDB, runs each oracle_sql.json entry and
compares the stringified frames (columns sorted by name, rows sorted by all
columns) against the Spark parquet dumps.

Usage: validate_oracles.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        oracle = canon(con.execute(oracles[name]).fetchdf())
        if list(spark.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(spark.columns)} vs {list(oracle.columns)}")
            n_fail += 1
        elif len(spark) != len(oracle):
            print(f"FAIL {name}: rows {len(spark)} vs {len(oracle)}")
            n_fail += 1
        elif not spark.equals(oracle):
            neq = (spark != oracle).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows; first:")
            print(pd.concat([spark[neq].head(3), oracle[neq].head(3)]))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(spark)} rows)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
