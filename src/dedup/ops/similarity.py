"""Similarity search over the `embeddings` table (array<float>, dim 64).

- brute-force cosine top-k: the correctness baseline, all JVM-side
  (`zip_with` + `aggregate`), DuckDB-oracle'd;
- LSH-bucketed ANN (random hyperplane signs): the scale path — candidates
  only within matching sign-buckets, vectorized numpy in a pandas UDF
  (rows-only oracle: the bucketing is not SQL-expressible).

Determinism: similarity rounded to 4 decimals before ranking, ties broken
by vec_id, so Spark and DuckDB produce identical top-k sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import load_table

_TOPK = 5
_QUERY_MOD = 50  # vec_id % _QUERY_MOD == 0 rows are the query set


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def embedding_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a deterministic query subset.

    The query side is tiny (1/50th of rows) and is broadcast; the quadratic
    side is (n/50)*n — the exact-scan baseline an ANN variant is judged
    against.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", vec.alias("v"))
    queries = base.where(F.col("vec_id") % _QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    pairs = base.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        "vec_id",
        # floor-half-up rounding: engine-neutral on ties (see textops._round4)
        (F.floor(_cosine(F.col("qv"), F.col("v")) * 10000 + F.lit(0.5)) / 10000)
        .alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOPK)
        .select("q_id", "vec_id", "sim", "rk")
    )


EMBEDDING_TOPK_SQL = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
  FROM embeddings
),
queries AS (
  SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id % {_QUERY_MOD} = 0
),
scored AS (
  SELECT q.q_id, b.vec_id,
         floor((list_sum(list_transform(list_zip(q.qv, b.v),
                                        p -> p[1] * p[2]))
                / (sqrt(list_sum(list_transform(q.qv, x -> x * x)))
                   * sqrt(list_sum(list_transform(b.v, x -> x * x)))))
               * 10000 + 0.5) / 10000 AS sim
  FROM base b CROSS JOIN queries q
  WHERE b.vec_id != q.q_id
),
ranked AS (
  SELECT q_id, vec_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT q_id, vec_id, sim, rk FROM ranked WHERE rk <= {_TOPK}
"""


def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN: 8 seeded random hyperplanes -> 8-bit sign bucket;
    neighbor candidates only within the same bucket (plus Hamming-1 probes),
    then exact cosine on candidates. At 10^12 scale the bucket join replaces
    the quadratic scan. Rows-only correctness (bucketing not in SQL);
    recall-vs-bruteforce is asserted in tests instead.
    """
    n_planes = 8
    emb = load_table(spark, sf_dir, "embeddings")

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(vs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(42)
        planes = rng.standard_normal((64, n_planes))
        out = []
        mat = np.stack(vs.to_numpy())
        signs = (mat @ planes) >= 0
        base = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)
        for bv in base:
            probes = [int(bv)] + [int(bv ^ (1 << i)) for i in range(n_planes)]
            out.append(probes)
        return pd.Series(out)

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select("vec_id", vec.alias("v"), buckets_udf("embedding").alias("bks"))
    # index side: primary bucket only; query side: all probe buckets
    idx = base.select("vec_id", "v", F.element_at("bks", 1).alias("bucket"))
    queries = (
        base.where(F.col("vec_id") % _QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("v").alias("qv"),
            F.explode("bks").alias("bucket"),
        )
    )
    cand = idx.join(queries, "bucket").where(F.col("vec_id") != F.col("q_id"))
    scored = cand.select(
        "q_id", "vec_id",
        (F.floor(_cosine(F.col("qv"), F.col("v")) * 10000 + F.lit(0.5)) / 10000)
        .alias("sim"),
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _TOPK)
        .select("q_id", "vec_id", "sim", "rk")
    )


def embedding_neardup_clusters(
    spark: SparkSession, sf_dir: str, tau: float = 0.90
) -> DataFrame:
    """Embedding-cosine near-dup dedup: vectors within cosine >= tau form a
    cluster (cluster_id = min vec_id of the connected component).

    Scale path: hyperplane-LSH bucket candidates (multi-probe) through the
    same skew-capped pair generator as the text channels, exact cosine only
    on candidates, then connected components — never a quadratic scan.
    Rows-only oracle (LSH bucketing + iterative CC are not SQL-expressible);
    recall is asserted on planted clusters in tests.
    """
    from ..config import DedupConfig
    from ..stages.cluster import connected_components
    from ..stages.minhash_lsh import pairs_from_buckets

    n_planes = 8
    emb = load_table(spark, sf_dir, "embeddings")

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(vs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(42)
        planes = rng.standard_normal((64, n_planes))
        mat = np.stack(vs.to_numpy())
        signs = (mat @ planes) >= 0
        base = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)
        return pd.Series(
            [[int(b)] + [int(b ^ (1 << i)) for i in range(n_planes)]
             for b in base]
        )

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        F.col("vec_id").alias("doc_id"), vec.alias("v"),
        buckets_udf("embedding").alias("bks"),
    ).persist()
    rows = base.select("doc_id", F.explode("bks").alias("bucket"))
    pairs = pairs_from_buckets(rows, ["bucket"], DedupConfig()).select("src", "dst")
    vecs = base.select("doc_id", "v")
    scored = (
        pairs.join(vecs.withColumnRenamed("doc_id", "src")
                       .withColumnRenamed("v", "v_src"), "src")
        .join(vecs.withColumnRenamed("doc_id", "dst")
                  .withColumnRenamed("v", "v_dst"), "dst")
        .withColumn("sim", _cosine(F.col("v_src"), F.col("v_dst")))
        .where(F.col("sim") >= tau)
        .select("src", "dst")
    )
    labels, _ = connected_components(scored)
    return (
        base.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            F.col("doc_id").alias("vec_id"),
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("vec_id") == F.col("cluster_id"))
    )


QUERIES = {
    "embedding_topk_cosine": (embedding_topk_cosine, EMBEDDING_TOPK_SQL),
    "embedding_ann_lsh": (embedding_ann_lsh, None),
    "embedding_neardup_clusters": (embedding_neardup_clusters, None),
}
