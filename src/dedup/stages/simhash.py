"""Stage 3 — SimHash + Hamming-ball candidate generation.

A second, independent near-dup channel (union'd with LSH candidates before
verification — SURVEY.md section 2.2 set-ops row): 64-bit SimHash per content,
candidates = pairs within Hamming distance <= config.hamming_radius.

Candidate generation is the pigeonhole construction: split 64 bits into
(radius+1) blocks; any two hashes within the radius agree exactly on at least
one block, so an equi-join on (block_id, block_value) is a COMPLETE generator
for the Hamming ball; the join is then filtered by true popcount distance —
all JVM-side (`bit_count(a ^ b)`), no Python in the join path.

Skew: block buckets get the same cap/star treatment as LSH buckets. A star
edge to the bucket pivot is only kept if it passes the Hamming filter, so for
mega-buckets SimHash intentionally under-generates; the LSH channel and the
verify stage's pivot edges cover those (boilerplate families are
near-identical, so pivot edges pass).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from .. import kernels as K


def simhashes(reps: DataFrame, config: DedupConfig) -> DataFrame:
    """(doc_id, simhash: long, blocks: array<long>)."""
    k = config.shingle_k
    norm = config.normalize
    n_blocks = config.hamming_radius + 1

    @F.pandas_udf(T.StructType([
        T.StructField("simhash", T.LongType()),
        T.StructField("blocks", T.ArrayType(T.LongType())),
    ]))
    def simhash_udf(texts: pd.Series) -> pd.DataFrame:
        sh = K.simhash_batch(texts.tolist(), k, normalize=norm)
        blocks = K.hamming_blocks(sh, n_blocks)
        return pd.DataFrame({"simhash": sh, "blocks": list(blocks)})

    from .minhash_lsh import drop_empty_normalized, ensure_parallelism

    reps = ensure_parallelism(drop_empty_normalized(reps),
                              config.shuffle_partitions)
    return reps.select("doc_id", simhash_udf("content").alias("s")).select(
        "doc_id", F.col("s.simhash").alias("simhash"), F.col("s.blocks").alias("blocks")
    )


def block_rows(simhash_df: DataFrame) -> DataFrame:
    return simhash_df.select(
        "doc_id", "simhash",
        F.posexplode("blocks").alias("block_id", "block_val"),
    )


# partition count of the persistent sim_blocks index — same treatment as the
# LSH bands index (minhash_lsh.N_PBUCKETS): incremental probes prune the
# scan to the sbuckets their batch touches instead of reading O(index) rows
# per ingest (VERDICT r2: probe_block_index was the last unpruned probe)
N_SBUCKETS = 256


def with_sbucket(blocks_df: DataFrame) -> DataFrame:
    return blocks_df.withColumn(
        "sbucket", F.pmod(F.col("block_val"), F.lit(N_SBUCKETS)).cast("int")
    )


def block_stats(simhash_df: DataFrame) -> DataFrame:
    """Per-block-bucket (size, pivot, pivot simhash) of the Hamming index;
    the pivot's simhash rides along so an incremental probe can still apply
    the JVM popcount filter to star edges without another join."""
    return block_rows(simhash_df).groupBy("block_id", "block_val").agg(
        F.count(F.lit(1)).alias("bsz"),
        F.min("doc_id").alias("pivot"),
        F.min_by("simhash", "doc_id").alias("pivot_simhash"),
    )


def candidate_pairs(
    simhash_df: DataFrame, config: DedupConfig, dedup: bool = True
) -> DataFrame:
    """Candidate edges (src < dst) within the Hamming ball, skew-capped.

    Bucket-pair generation is shared with the LSH channel
    (minhash_lsh.pairs_from_buckets); the simhash value rides along as the
    bucket payload so the JVM popcount filter needs no extra join.
    `dedup=False` defers (src, dst) dedup to a union composition's single
    global pass (see pairs_from_buckets) — the popcount filter is a pure
    function of the pair, so applying it to duplicate rows is harmless.
    """
    from .minhash_lsh import pairs_from_buckets

    pairs = pairs_from_buckets(
        block_rows(simhash_df), ["block_id", "block_val"], config,
        payload_col="simhash", dedup=dedup,
    )
    return (
        pairs.where(
            F.expr(
                f"bit_count(payload_src ^ payload_dst) <= {config.hamming_radius}"
            )
        )
        .select("src", "dst")
    )
