#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with every
parquet table of <sfDir> registered as a view, loads the corresponding
Spark result parquet, sorts columns by name and rows by all columns, and
compares cell-exact (NaN-safe). Exit code 1 if any declared query mismatches.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            failures.append(name)
            print(f"FAIL  {name}: no spark output")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL error: {e}")
            continue
        got = pd.read_parquet(res_dir)
        exp_c, got_c = canon(exp), canon(got)
        if list(exp_c.columns) != list(got_c.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns exp={list(exp_c.columns)} got={list(got_c.columns)}")
            continue
        if len(exp_c) != len(got_c):
            failures.append(name)
            print(f"FAIL  {name}: rows exp={len(exp_c)} got={len(got_c)}")
            continue
        # cell-exact compare, treating NaN/None as equal to each other
        exp_s = exp_c.astype(object).where(pd.notnull(exp_c), None)
        got_s = got_c.astype(object).where(pd.notnull(got_c), None)
        if not exp_s.equals(got_s):
            diff = (exp_s != got_s)
            ncell = int(diff.to_numpy().sum())
            failures.append(name)
            print(f"FAIL  {name}: {ncell} differing cells")
            mask = diff.any(axis=1)
            print("  exp:", exp_s[mask].head(3).to_dict("records"))
            print("  got:", got_s[mask].head(3).to_dict("records"))
        else:
            print(f"ok    {name}: {len(exp_c)} rows")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
