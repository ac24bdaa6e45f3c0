"""Stage 2 — MinHash signatures + LSH band bucketing + candidate pairs.

Signature math is vectorized numpy inside an Arrow-batched pandas UDF
(BASELINE.json input_hint: no per-row Python); banding and the bucket
self-join are pure DataFrame ops so Catalyst/AQE own the physical plan.

The near-dup "key" generalizes the reference's stable `id`: two contents
sharing any (band_id, band_hash) are candidate duplicates, exactly as two
calls sharing `id` are duplicates in the reference (README.md:14-16) — but
probabilistic, so candidates flow to the verify stage instead of being final.

Skew (SURVEY.md section 4.2.1 — the explicit part of the north rule): boilerplate
contents produce mega-buckets whose all-pairs join is quadratic. Buckets over
`bucket_cap` are star-linked: every member gets one edge to the bucket's min
doc_id (pivot). This preserves connectivity of the bucket in the final
clustering (linear edges, no quadratic blowup) and the verify stage still
checks each such edge pairwise. AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from .. import kernels as K


def ensure_parallelism(df: DataFrame, target: int) -> DataFrame:
    """Repartition only when the input is under-split (e.g. a single small
    parquet file -> 1 scan partition would serialize the pandas UDFs). A
    well-partitioned input at cluster scale passes through untouched — no
    gratuitous shuffle of fat content rows."""
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def signatures(reps: DataFrame, config: DedupConfig) -> DataFrame:
    """(doc_id, sig: array<long>, bands: array<long>).

    The UDF computes MinHash signatures for a whole Arrow batch at once
    (matrix (num_perm, n_shingles) per doc, loop only over docs in the batch)
    and folds each band's rows into a single 64-bit key kernel-side. The full
    signature is kept alongside the band keys: the verify stage uses it for a
    JVM-side estimated-Jaccard prefilter, so candidate pairs that are noise
    never reach Python or drag content through a shuffle.
    """
    k = config.shingle_k
    bands, rows = config.bands, config.rows_per_band
    norm = config.normalize
    a, b = K.make_minhash_coeffs(config.num_perm, config.seed)

    @F.pandas_udf(T.StructType([
        T.StructField("sig", T.ArrayType(T.LongType())),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]))
    def sig_udf(texts: pd.Series) -> pd.DataFrame:
        sigs = K.minhash_batch(texts.tolist(), k, a, b, normalize=norm)
        bh = K.band_hashes(sigs, bands, rows)
        return pd.DataFrame(
            {"sig": list(sigs.view(np.int64)), "bands": list(bh)}
        )

    reps = ensure_parallelism(reps, config.shuffle_partitions)
    return reps.select("doc_id", sig_udf("content").alias("s")).select(
        "doc_id", F.col("s.sig").alias("sig"), F.col("s.bands").alias("bands")
    )


def band_rows(sig_df: DataFrame) -> DataFrame:
    """Explode band keys into (doc_id, band_id, band_hash) bucket rows.
    The full `sig` column is deliberately NOT carried: band rows are
    num_perm/rows_per_band per doc and feed a shuffle."""
    return sig_df.select(
        "doc_id", F.posexplode("bands").alias("band_id", "band_hash")
    )


def candidate_pairs(bands_df: DataFrame, config: DedupConfig) -> DataFrame:
    """Candidate edges (src < dst) from LSH buckets, skew-capped.

    - buckets of size 2..bucket_cap: all-pairs via self-equi-join on
      (band_id, band_hash) with doc_id< predicate,
    - buckets larger than bucket_cap: star edges to the bucket min
      (linear; keeps the bucket connected without the quadratic join).
    """
    w = Window.partitionBy("band_id", "band_hash")
    sized = (
        bands_df
        .withColumn("bsz", F.count(F.lit(1)).over(w))
        .where(F.col("bsz") >= 2)
    )
    small = sized.where(F.col("bsz") <= config.bucket_cap).drop("bsz")
    a, b = small.alias("a"), small.alias("b")
    pairs_small = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    big = sized.where(F.col("bsz") > config.bucket_cap)
    pairs_big = (
        big.withColumn("pivot", F.min("doc_id").over(w))
        .where(F.col("doc_id") != F.col("pivot"))
        .select(F.col("pivot").alias("src"), F.col("doc_id").alias("dst"))
    )
    return pairs_small.unionByName(pairs_big).dropDuplicates(["src", "dst"])
