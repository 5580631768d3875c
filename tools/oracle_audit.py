#!/usr/bin/env python3
"""Oracle output-type audit (round-11 judge ask #3).

Usage: python3 tools/oracle_audit.py <sfDir> <oracle_sql.json>

DESCRIBEs every oracle SQL against DuckDB views over the testdata parquet
and FAILS (exit 1) if any OUTPUT column is typed HUGEINT / UHUGEINT /
DECIMAL. Those types are the exact class the driver's correctness gate
hashes differently from Spark: pandas renders a DuckDB HUGEINT as float
(`1.0`) while Spark's BIGINT renders `1`, so the hash mismatches even when
every value is numerically equal (round 10's q_scd2). The fix is always an
explicit CAST in the oracle SQL (house pattern: q_recursive_cte's
`CAST(max(depth) AS BIGINT)`).

This is the SOUND version of a static "is every aggregate cast?" scan:
only the SQL engine itself can type an expression, so we ask DuckDB
(DESCRIBE plans without executing — the sweep is metadata-only and runs in
seconds). OracleHygieneSpec invokes this from `sbt test`; tools/selfcheck.py
runs the same check inline before comparing values.

Dev tool only — NOT part of the engine (driver-side python is allowed for
local verification; the engine itself is pure Scala/Spark).
"""
import json, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
HAZARD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    n_hazard = 0
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute("DESCRIBE " + sql).fetchall()
        except Exception as e:
            print(f"HAZARD {name}: DESCRIBE failed: {e}")
            n_hazard += 1
            continue
        hits = [f"{c}: {t}" for c, t, *_ in desc
                if any(t.upper().startswith(h) for h in HAZARD_TYPES)]
        if hits:
            print(f"HAZARD {name}: {'; '.join(hits)} — add an explicit CAST in the oracle SQL")
            n_hazard += 1
    print(f"audited {len(oracle)} oracles, hazards={n_hazard}")
    sys.exit(1 if n_hazard else 0)


if __name__ == "__main__":
    main()
