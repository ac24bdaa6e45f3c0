"""EXACT Spark-vs-DuckDB oracle check — stricter than tests/test_entry_oracles
(which allows atol=1e-4). The driver's gate is a value-hash, so any change to
how a query computes must leave every value BIT-identical. This script
compares sorted rows with exact equality (floats compared bitwise via
struct-pack) at any SF dir.

Usage:
  python check_exact.py --sf-dir /root/testdata/sf0.01 \
      --queries embedding_topk_cosine,embedding_ann_ivf
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

SRC = str(Path(__file__).resolve().parent / "src")
if SRC not in sys.path:
    sys.path.insert(0, SRC)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            # bitwise representation: any ULP difference shows up
            df[c] = df[c].astype("float64").values.view("uint64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("check-exact")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    results = {}
    ok_all = True
    for name in names:
        got = canon(qs[name](spark, args.sf_dir).toPandas())
        exp = canon(con.execute(sqls[name]).df())
        same_cols = list(got.columns) == list(exp.columns)
        same_rows = len(got) == len(exp)
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            exact = True
        except AssertionError as e:
            exact = False
            print(f"--- {name} MISMATCH ---\n{e}", file=sys.stderr)
        ok = same_cols and same_rows and exact
        ok_all &= ok
        results[name] = {
            "rows": len(got), "oracle_rows": len(exp),
            "cols_match": same_cols, "exact_match": exact,
        }
    spark.stop()
    print(json.dumps({"sf_dir": args.sf_dir, "ok": ok_all, **results}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
