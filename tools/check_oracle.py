#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check_oracle.py <sf_dir> <verify_out_dir>

For each query result parquet dumped by graft.Verify, runs the matching
oracle SQL (from oracle_sql.json) in DuckDB over the same test tables,
then compares: row count, column names, dtypes, and cell values
(columns sorted by name, rows sorted by all columns).
"""
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame, sort_rows: bool) -> pd.DataFrame:
    # columns sorted by name (like the driver); rows kept in FILE ORDER
    # by default — stricter than any plausible driver comparator, so an
    # ORDER BY that isn't a total order fails here first
    df = df.reindex(sorted(df.columns), axis=1)
    if sort_rows and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_raw = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want_raw = con.sql(sql).df()
            got, want = canon(got_raw, False), canon(want_raw, False)
        except Exception as e:
            print(f"FAIL {name}: exception {str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(want.columns):
            problems.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        elif len(got) != len(want):
            problems.append(f"rows spark={len(got)} duck={len(want)}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    problems.append(
                        f"dtype[{c}] spark={got[c].dtype} duck={want[c].dtype}")
            if not problems:
                try:
                    pd.testing.assert_frame_equal(
                        got, want, check_exact=True, check_dtype=False)
                except AssertionError as e:
                    # distinguish row-order-only divergence (still a
                    # failure: the ORDER BY isn't a total order)
                    try:
                        pd.testing.assert_frame_equal(
                            canon(got_raw, True), canon(want_raw, True),
                            check_exact=True, check_dtype=False)
                        problems.append(
                            "ROW ORDER ONLY — ORDER BY not total: "
                            + str(e).split("\n")[1][:120])
                    except AssertionError:
                        problems.append(
                            "values: " + str(e).split("\n")[1][:160])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)[:400]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
