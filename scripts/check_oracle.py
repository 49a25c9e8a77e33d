#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the raw testdata parquet and compare against the Verify dump.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df


def cmp_frames(name, spark_df, duck_df):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA cols spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS spark={len(spark_df)} duck={len(duck_df)}"
    a, b = canon(spark_df), canon(duck_df)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    return f"VALUE col={col} row={i}: spark={x!r} duck={y!r} (diff={x-y!r})"
            elif str(x) != str(y):
                return f"VALUE col={col} row={i}: spark={x!r} duck={y!r}"
    # dtype drift is a warning only (driver may compare post-canonicalization)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            print(f"  [warn] {name}: dtype {col} spark={a[col].dtype} duck={b[col].dtype}")
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {pq_dir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                                 ignore_index=True)
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        err = cmp_frames(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
