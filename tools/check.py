#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dir (Spark result) and runs
<verifyOutDir>/oracle_sql.json[name] in DuckDB over <sfDir>'s tables,
then compares: schema (column names), row count, and values (columns
sorted by name, rows sorted by all columns).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    # STRICT canonical-string equality — the driver hashes stringified
    # values, so any representation drift (decimal trailing zeros,
    # 1 vs 1.0, precision) must FAIL here too. No float fallback.
    try:
        if bool(pd.isna(a)) != bool(pd.isna(b)):
            return False
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        try:
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        errs = []
        if list(spark_df.columns) != list(duck_df.columns):
            errs.append(f"schema {list(spark_df.columns)} != {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            errs.append(f"rows {len(spark_df)} != {len(duck_df)}")
        else:
            for col in spark_df.columns:
                sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
                bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if not values_equal(a, b)]
                if bad:
                    i, a, b = bad[0]
                    errs.append(f"col {col}: {len(bad)} mismatches, first at row {i}: {a!r} != {b!r}"
                                f" (types {type(a).__name__}/{type(b).__name__})")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
