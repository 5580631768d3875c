#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (SURVEY.md §5.2).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each testdata table as a
DuckDB view over <sfDir>/<name>.parquet, runs each oracle SQL, loads the
Spark result parquet from <verifyOutDir>/<name>/, sorts columns by name
(like the driver), and compares shape + values. Exit 1 on any mismatch.

HASH-FIDELITY (round 11): the driver renders each value with pandas and
hashes the rendering, so an oracle column DuckDB types as HUGEINT or
DECIMAL is rendered `1.0` while Spark's BIGINT renders `1` — a hash
mismatch even when every value is numerically equal (this is exactly how
q_scd2 shipped locally-green but driver-red in round 10). This mimic
therefore:
  1. DESCRIBEs every oracle and FAILS any output column typed
     HUGEINT/UHUGEINT/DECIMAL — those must carry an explicit CAST in the
     oracle SQL (house pattern: q_recursive_cte's CAST(... AS BIGINT));
  2. never coerces across dtype KINDS: an integer column on one side and
     a float column on the other is a FAILURE, not a cast (widths within
     a kind — int32 vs int64, float32 vs float64 — are widened, matching
     how pandas renders both sides identically);
  3. floats compare exactly where possible and report the max abs diff
     when it is nonzero but under the 1e-9 tolerance, so near-misses are
     visible instead of silently absorbed.

Dev tool only — NOT part of the engine (driver-side python is allowed for
local verification; the engine itself is pure Scala/Spark).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# DuckDB output types the driver's pandas rendering turns into floats (or
# decimal objects) while Spark emits integer/decimal-exact values. Any
# oracle emitting one of these in its OUTPUT columns is a latent hash
# mismatch and must cast (BIGINT/DOUBLE) explicitly.
HAZARD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def kind(col):
    """Collapse a column to the rendering kind the driver hashes. Takes the
    SERIES (not just dtype): Spark DATE columns arrive as object-of-
    datetime.date while DuckDB DATEs arrive datetime64 — the driver hashed
    that pair green in r10 (q_date_funcs), so both map to "datetime"."""
    dtype = col.dtype
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if dtype == object:
        import datetime
        vals = col.dropna()
        if len(vals) and all(isinstance(v, (datetime.date, datetime.datetime)) for v in vals.head(50)):
            return "datetime"
    return "object"


def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    # widen WITHIN a kind only — never across kinds (hash-fidelity rule 2)
    for c in df.columns:
        k = kind(df[c])
        if k == "float":
            df[c] = df[c].astype("float64")
        elif k == "int":
            df[c] = df[c].astype("int64")
    return df


def type_hazards(con, sql):
    """DESCRIBE the oracle; return output columns whose DuckDB type the
    driver's hasher renders differently from Spark's integer output."""
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception as e:
        return [f"DESCRIBE failed: {e}"]
    return [f"{name}: {typ}" for name, typ, *_ in desc
            if any(typ.upper().startswith(h) for h in HAZARD_TYPES)]


def compare(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLUMNS spark={list(s.columns)} duck={list(d.columns)}"
    if s.shape != d.shape:
        return f"SHAPE spark={s.shape} duck={d.shape}"
    for c in s.columns:
        a, b = s[c], d[c]
        ka, kb = kind(a), kind(b)
        if ka != kb:
            return (f"DTYPE col={c}: spark renders {ka} ({a.dtype}) vs duck "
                    f"{kb} ({b.dtype}) — driver hash WILL differ; cast the oracle")
        if ka == "datetime":
            av, bv = pd.to_datetime(a), pd.to_datetime(b)
            eq = (av == bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return f"VALUES col={c} row={bad}: spark={a[bad]!r} duck={b[bad]!r}"
        elif ka == "float":
            av, bv = a.fillna(np.nan).to_numpy(), b.fillna(np.nan).to_numpy()
            if not np.allclose(av, bv, rtol=0, atol=1e-9, equal_nan=True):
                bad = int(np.argmax(~np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)))
                return f"VALUES col={c} row={bad}: spark={av[bad]!r} duck={bv[bad]!r}"
            both = ~(np.isnan(av) | np.isnan(bv))
            if both.any():
                mad = float(np.max(np.abs(av[both] - bv[both])))
                if mad != 0.0:
                    print(f"    warn {name}.{c}: floats differ by ≤{mad:.2e} (inside 1e-9; driver hash may still differ)")
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
        hazards = type_hazards(con, sql)
        if hazards:
            print(f"  FAIL {name}: oracle output type hazard — {'; '.join(hazards)}")
            n_fail += 1
            continue
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
