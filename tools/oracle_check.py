#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

For each query dir under verifyOutDir: load the Spark parquet result, run the
oracle SQL (from oracle_sql.json) in DuckDB over the sfDir tables, sort columns
by name, and compare row count, schema (column names), and exact values.
Prints one line per query: OK / MISMATCH / ERROR / ROWSONLY.
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q_*"))
    n_ok = n_bad = 0
    for name in qdirs:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: ERROR no spark output files")
            n_bad += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"{name}: ROWSONLY rows={len(spark_df)}"
                  + (" EMPTY!" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ERROR oracle sql failed: {e}")
            n_bad += 1
            continue
        s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
        o = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
        if list(s.columns) != list(o.columns):
            print(f"{name}: MISMATCH schema spark={list(s.columns)} oracle={list(o.columns)}")
            n_bad += 1
            continue
        if len(s) != len(o):
            print(f"{name}: MISMATCH rows spark={len(s)} oracle={len(o)}")
            n_bad += 1
            continue
        bad_cols = []
        bad_types = []
        for c in s.columns:
            a, b = s[c], o[c]
            # Type-strict on numeric/bool kinds, matching the driver's hash:
            # an int64 Spark column vs a HUGEINT/float oracle column is a
            # mismatch even when every value compares equal.
            strict = "iufb"
            if (a.dtype.kind in strict or b.dtype.kind in strict) \
                    and a.dtype != b.dtype:
                bad_types.append(f"{c}({a.dtype}!={b.dtype})")
                continue
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    eq = ((a.isna() & b.isna()) | (a.astype(object) == b.astype(object))).all()
            except Exception:
                eq = False
            if not eq:
                bad_cols.append(c)
        if bad_types:
            print(f"{name}: MISMATCH dtypes {bad_types}")
            n_bad += 1
            continue
        if bad_cols:
            print(f"{name}: MISMATCH values cols={bad_cols}")
            for c in bad_cols[:2]:
                diff = s[c].astype(object) != o[c].astype(object)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"    row {i} col {c}: spark={s[c][i]!r} oracle={o[c][i]!r}")
            n_bad += 1
        else:
            print(f"{name}: OK rows={len(s)}")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, "
          f"{len([q for q in qdirs if q not in oracle])} rows-only ==")


if __name__ == "__main__":
    main()
