#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no Python dependency).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against views named
after the parquet tables in <sfDir>, and compares: schema (column names),
row count, and values (columns sorted by name, rows sorted by all
columns, doubles compared to 1e-9 after the query's own rounding).
"""
import json
import sys
import glob

import duckdb
import pandas as pd


def load_spark_result(path: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet under {path}")
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list:
    problems = []
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"schema mismatch: spark={sc} oracle={oc}")
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s, o = canon(spark_df), canon(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            diff = (pd.to_numeric(sv) - pd.to_numeric(ov)).abs()
            bad = diff[diff.fillna(0) > 1e-9]
            na_mismatch = sv.isna() != ov.isna()
            if len(bad) or na_mismatch.any():
                i = bad.index[0] if len(bad) else na_mismatch[na_mismatch].index[0]
                problems.append(f"col {c}: first diff at row {i}: spark={sv[i]} oracle={ov[i]}")
        else:
            neq = sv.astype(str) != ov.astype(str)
            if neq.any():
                i = neq[neq].index[0]
                problems.append(f"col {c}: first diff at row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
    return problems


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        t = f.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle_sql.items()):
        try:
            spark_df = load_spark_result(f"{out_dir}/{name}")
            oracle_df = con.execute(sql).fetchdf()
            problems = compare(name, spark_df, oracle_df)
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {e}"]
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
