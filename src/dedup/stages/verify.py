"""Stage 4 — pairwise verification of candidate edges.

Candidates from LSH/SimHash are probabilistic; this stage is the ground-truth
gate before clustering (the batch analogue of the reference decoding the
STORED result instead of trusting the caller — DeduplicationContext.scala:163-167:
a duplicate claim must be proven against the actual content).

Per candidate pair, on the normalized contents:
- exact k-shingle Jaccard (vectorized set intersection of shingle hashes),
- if Jaccard is inconclusive (below the fast-accept floor but above the
  reject gate), suffix-array longest-common-substring (kernels.py, prefix
  doubling + binary-lifting LCP — the SURVEY.md section 7 step-5 kernel).

Accept iff jaccard >= jaccard_floor OR lcs >= max(lcs_min_chars,
lcs_min_ratio * min(len_a, len_b)).

Physical plan: two repartition-joins attach contents by doc_id, then an
explicit `repartition(content-bearing pair rows)` bounds task payload before
mapInPandas (pair rows carry TWO contents — SURVEY.md section 4.2.2), and the
verification runs one Arrow batch at a time with no Spark-side per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from .. import kernels as K

_OUT_SCHEMA = (
    "src long, dst long, jaccard double, lcs long, accepted boolean"
)


def prepare_pairs(
    edges: DataFrame, reps: DataFrame, sig_df: DataFrame, config: DedupConfig
) -> DataFrame:
    """One enriched join pass: attach (sig, content) per side, compute the
    JVM estimated Jaccard, and keep only plausible pairs with their contents
    — (src, dst, est_jaccard, content_src, content_dst).

    Each side is ONE shuffle join against reps+sigs merged (content and
    signature travel together), instead of separate prefilter and
    attach-content join rounds. The est filter runs before the second join's
    output materializes downstream, so hopeless pairs never carry two
    contents into the verify exchange.
    """
    enriched = reps.select("doc_id", "content").join(
        sig_df.select("doc_id", "sig"), "doc_id"
    )
    n = float(config.num_perm)
    est = (
        F.aggregate(
            F.zip_with("sig_src", "sig_dst", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double") / F.lit(n)
    )
    src_side = enriched.select(
        F.col("doc_id").alias("src"),
        F.col("content").alias("content_src"),
        F.col("sig").alias("sig_src"),
    )
    dst_side = enriched.select(
        F.col("doc_id").alias("dst"),
        F.col("content").alias("content_dst"),
        F.col("sig").alias("sig_dst"),
    )
    return (
        edges.join(src_side, "src")
        .join(dst_side, "dst")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= config.prefilter_min_est_jaccard)
        .select("src", "dst", "est_jaccard", "content_src", "content_dst")
    )


def verify_edges(pairs_with_content: DataFrame, config: DedupConfig,
                 num_partitions: int | None = None) -> DataFrame:
    """Score and filter candidate pairs; returns accepted edges with evidence."""
    k = config.shingle_k
    norm = config.normalize
    floor = config.jaccard_floor
    lcs_gate = config.lcs_gate_jaccard
    lcs_min = config.lcs_min_chars
    lcs_ratio = config.lcs_min_ratio

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = len(pdf)
            jac = [0.0] * n
            lcs = [0] * n
            ok = [False] * n
            # Per-batch memo: a doc (esp. a star pivot) appears in many
            # pairs; normalize + shingle it once. Range partitioning on
            # (src, dst) below gives same-src runs, so hit rates are high.
            texts: dict[int, str] = {}
            shingle_sets: dict[int, "np.ndarray"] = {}

            def prep(doc_id: int, raw: str) -> tuple[str, "np.ndarray"]:
                t = texts.get(doc_id)
                if t is None:
                    t = K.normalize_text(raw) if norm else raw
                    texts[doc_id] = t
                    shingle_sets[doc_id] = K.char_shingle_hashes(t, k)
                return t, shingle_sets[doc_id]

            src_ids = pdf["src"].to_numpy()
            dst_ids = pdf["dst"].to_numpy()
            for i in range(n):
                ca, sa = prep(src_ids[i], pdf["content_src"].iat[i])
                cb, sb = prep(dst_ids[i], pdf["content_dst"].iat[i])
                if sa.size == 0 and sb.size == 0:
                    j = 1.0
                else:
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    j = inter / float(sa.size + sb.size - inter)
                jac[i] = j
                if j >= floor:
                    ok[i] = True
                    continue
                if j < lcs_gate:
                    continue
                ln = K.longest_common_substring(ca, cb)
                lcs[i] = ln
                threshold = max(lcs_min, int(lcs_ratio * min(len(ca), len(cb))))
                ok[i] = ln >= threshold
            yield pd.DataFrame(
                {"src": pdf["src"], "dst": pdf["dst"], "jaccard": jac,
                 "lcs": lcs, "accepted": ok}
            )

    df = pairs_with_content
    if num_partitions:
        # range partitioning (not hash): pairs sort by (src, dst), so all of
        # a pivot's edges land contiguously and the per-batch memo hits
        df = df.repartitionByRange(num_partitions, "src", "dst")
    return df.mapInPandas(_verify, _OUT_SCHEMA)
