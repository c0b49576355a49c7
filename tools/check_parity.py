#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read Verify.scala's
parquet dumps + oracle_sql.json, run each oracle in DuckDB over the same
sf dir, and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VALUE col={c} row={i}: {x!r} != {y!r} (d={x-y})"
            elif pd.isna(x) and pd.isna(y):
                continue
            elif x != y:
                return f"VALUE col={c} row={i}: {x!r} != {y!r}"
    return None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_bad += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        err = cmp(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
