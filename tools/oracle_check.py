#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every SQL from
<verifyOutDir>/oracle_sql.json, and compares against the Spark result
parquet written by `graft.Verify` (column-name-sorted, row-sorted).
Dev-only tool — the engine itself is pure Scala/Spark.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # list/array-typed cells are unhashable and break sort_values — render
    # them to strings before canonicalizing (comparison stays exact)
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
            lambda v: not isinstance(v, (str, bytes, type(None)))
        ).any():
            df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, "__len__") and not isinstance(v, (str, bytes)) else v)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), na_position="first", kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # subset Verify runs write a suffixed oracle file so they can never be
    # mistaken for (or contaminate) a full run's oracle_sql.json
    import os
    subset = f"{out_dir}/oracle_sql.subset.json"
    oracle_file = subset if os.path.exists(subset) else f"{out_dir}/oracle_sql.json"
    with open(oracle_file) as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failures += 1
            continue
        dtype_diff = [
            (c, str(exp[c].dtype), str(got[c].dtype))
            for c in exp.columns
            if str(exp[c].dtype) != str(got[c].dtype)
        ]
        try:
            pd.testing.assert_frame_equal(
                exp, got, check_dtype=False, check_exact=True
            )
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            failures += 1
            continue
        note = f" (dtype diff: {dtype_diff})" if dtype_diff else ""
        print(f"ok   {name}: {len(exp)} rows{note}")
    print(f"\n{len(oracles) - failures}/{len(oracles)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
