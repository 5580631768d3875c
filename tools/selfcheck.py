#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (SURVEY.md §5.2).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view over <sfDir>/<name>.parquet, runs each oracle SQL, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name
(like the driver), and compares shape + values. Exit 1 on any mismatch.

Dev tool only — NOT part of the engine (driver-side python is allowed for
local verification; the engine itself is pure Scala/Spark).
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    # normalize dtypes a little: all floats -> float64, ints -> int64
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def compare(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLUMNS spark={list(s.columns)} duck={list(d.columns)}"
    if s.shape != d.shape:
        return f"SHAPE spark={s.shape} duck={d.shape}"
    for c in s.columns:
        a, b = s[c], d[c]
        if pd.api.types.is_float_dtype(a):
            if not np.allclose(a.fillna(np.nan), b.fillna(np.nan), rtol=0, atol=1e-9, equal_nan=True):
                bad = (~np.isclose(a, b, rtol=0, atol=1e-9)).idxmax()
                return f"VALUES col={c} row={bad}: spark={a[bad]!r} duck={b[bad]!r}"
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return f"VALUES col={c} row={bad}: spark={a[bad]!r} duck={b[bad]!r} (dtypes {a.dtype}/{b.dtype})"
    return None


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"  FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"  FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"  FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"  ok   {name}  ({len(spark_df)} rows)")
            n_pass += 1
    # queries without oracle (rows-only check)
    import os
    for name in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, name)
        if os.path.isdir(p) and name not in oracle:
            df = load_spark(outdir, name)
            rows = 0 if df is None else len(df)
            status = "ok  " if rows > 0 else "FAIL"
            if rows == 0:
                n_fail += 1
            else:
                n_skip += 1
            print(f"  {status} {name}  (rows-only: {rows} rows)")
    print(f"pass={n_pass} rows-only={n_skip} fail={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
