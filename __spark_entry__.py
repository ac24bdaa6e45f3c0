"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship near-dup clustering over sf0.001 documents.
queries()      — every implemented operator (SURVEY.md section 2 + training-data
                 ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB-equivalent SQL for the SQL-expressible subset; the
                 pandas-UDF-backed channels (MinHash/LSH, SimHash, ANN,
                 near-dup clustering) are rows-only by design.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_SRC = str(Path(__file__).resolve().parent / "src")
if _SRC not in sys.path:
    sys.path.insert(0, _SRC)


def _registry():
    from dedup.ops import (
        dedup_queries, ledger_queries, multimodal, relational, similarity,
        textops,
    )

    merged: dict[str, tuple] = {}
    for mod in (dedup_queries, textops, similarity, relational, multimodal,
                ledger_queries):
        merged.update(mod.QUERIES)
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full near-dup clustering
    (MinHash/LSH + SimHash candidates -> verify -> connected components)."""
    from dedup.ops.dedup_queries import neardup_clusters_documents

    return neardup_clusters_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _registry().items() if sql is not None
    }
