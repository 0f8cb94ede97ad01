#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate (dev tooling only;
the engine itself is pure Scala/Spark).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <verify_out_dir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
sf_dir tables, and compares row counts, sorted column names, and values
(exact for ints/strings, tiny epsilon for floats).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    # The driver hashes values exactly, so an int on one side vs a float
    # on the other (e.g. DuckDB HUGEINT -> pandas float64) is a FAIL there
    # even when numerically equal ("1234" vs "1234.0"). Mirror that.
    import numbers
    a_int = isinstance(a, numbers.Integral)
    b_int = isinstance(b, numbers.Integral)
    if a_int != b_int and (isinstance(a, float) or isinstance(b, float)):
        return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    return str(a) == str(b)


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    passed, failed = [], []
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = normalize(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            failed.append(name)
            continue
        try:
            duck_df = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            failed.append(name)
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            failed.append(name)
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            failed.append(name)
            continue
        bad = None
        for col in spark_df.columns:
            sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                a = None if (isinstance(a, float) and math.isnan(a)) or a is pd.NaT else a
                b = None if (isinstance(b, float) and math.isnan(b)) or b is pd.NaT else b
                if not values_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={col} row={i}: spark={a!r} duck={b!r}")
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
            passed.append(name)
    # rows-only queries
    import os
    names_on_disk = {d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d))}
    for name in sorted(names_on_disk - set(oracles)):
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            status = "PASS" if n > 0 else "FAIL(empty)"
            print(f"{status} {name} (rows-only, {n} rows)")
            if n == 0:
                n_fail += 1
                failed.append(name)
            else:
                n_pass += 1
                passed.append(name)
        except Exception as e:
            print(f"FAIL {name}: unreadable ({e})")
            n_fail += 1
            failed.append(name)
    print(f"== {n_pass} pass / {n_fail} fail ==")
    # Machine-readable artifact beside the verify dump: COVERAGE.md's
    # "verified at sf X" census is pasted from this file, never
    # hand-written (the round-7 j9 lesson).
    with open(f"{out_dir}/oracle_check.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "passed": sorted(passed), "failed": sorted(failed)}, f,
                  indent=0)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
