"""Operator-coverage queries + training-data-pipeline operations.

Each module exposes `QUERIES: dict[name, (spark_fn, oracle_sql | None)]`
where spark_fn(spark, sf_dir) -> DataFrame and oracle_sql is the DuckDB-
equivalent ANSI SQL (None => non-SQL-expressible, driver does a rows-only
check). `__spark_entry__.py` aggregates them all.
"""

from __future__ import annotations


def load_table(spark, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
