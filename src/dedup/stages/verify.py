"""Stage 4 — pairwise verification of candidate edges.

Candidates from LSH/SimHash are probabilistic; this stage is the ground-truth
gate before clustering (the batch analogue of the reference decoding the
STORED result instead of trusting the caller — DeduplicationContext.scala:163-167:
a duplicate claim must be proven against the actual content).

Per candidate pair, on the normalized contents:
- exact k-shingle Jaccard (vectorized set intersection of shingle hashes),
- if Jaccard is inconclusive (below the fast-accept floor but above the
  reject gate), an EXACT O(n) common-run probe decides `LCS >= threshold`
  (Rabin-Karp window hashes memoized per doc + substring-compare
  confirmation, kernels.run_hashes/_confirm_common_run); the exact
  evidence length for probe-accepted pairs comes from a binary search
  over the same probe (kernels.longest_common_run_from — identical value
  to the suffix-array LCS at ~1/5 the cost); the O(n log n) suffix array
  (prefix doubling + binary-lifting LCP — the SURVEY.md section 7 step-5
  kernel) remains the probe's collision fallback and the test oracle.

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
from pyspark.sql import types as T

from ..config import DedupConfig
from .. import kernels as K

_OUT_SCHEMA = (
    "src long, dst long, jaccard double, lcs long, accepted boolean"
)


def doc_fingerprints(reps: DataFrame, config: DedupConfig) -> DataFrame:
    """(doc_id, fp: array<long>, nlen: int) — content-defined sampled
    fingerprints for the pre-shuffle LCS screen.

    fp holds the width-`lcs_min_chars` window hashes of the NORMALIZED text
    whose value is below 2^64/p, with p = clamp(nlen / fp_budget,
    fp_min_rate, ...). Selection depends only on content, so two docs
    sharing a run select identical hashes inside it; a run of g grams then
    yields a shared fingerprint with probability 1 - (1 - 1/max(p))^g.
    One O(n)-per-doc pandas pass — per DOC, never per pair."""
    width = config.lcs_min_chars
    budget = config.fp_budget
    min_rate = config.fp_min_rate
    norm = config.normalize

    @F.pandas_udf(T.StructType([
        T.StructField("fp", T.ArrayType(T.LongType())),
        T.StructField("nlen", T.IntegerType()),
    ]))
    def fp_udf(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        fps, nlens = [], []
        for raw in texts:
            t = K.normalize_text(raw) if norm else raw
            h = K.run_hashes(t, width)
            p = max(min_rate, (len(t) + budget - 1) // budget)
            thr = np.uint64(2**64 // p)
            sel = np.unique(h[h < thr]).view(np.int64)
            fps.append(sel.tolist())
            nlens.append(len(t))
        return pd.DataFrame({"fp": fps, "nlen": nlens})

    return reps.select("doc_id", fp_udf("content").alias("f")).select(
        "doc_id", F.col("f.fp").alias("fp"), F.col("f.nlen").alias("nlen")
    )


def prepare_pairs(
    edges: DataFrame,
    reps: DataFrame,
    sig_df: DataFrame,
    config: DedupConfig,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Candidate pairs with contents attached, triply pruned BEFORE any
    content bytes move — (src, dst, est_jaccard, content_src, content_dst):

    1. est-Jaccard prefilter (JVM fold over the signatures): pairs whose
       estimate sits below prefilter_min_est_jaccard never go further;
    2. LCS-impossibility: when the estimate also rules out the Jaccard
       branch (< jaccard_floor_gate), a pair whose LCS threshold exceeds
       the shorter doc's length is dropped outright;
    3. fingerprint screen: for the same Jaccard-impossible band, the
       content-defined sampled fingerprints (doc_fingerprints) must
       overlap whenever the screen's detection mass
       lambda = (threshold - width + 1)/max(p_a, p_b) clears
       fp_screen_min_lambda — pairs failing arrays_overlap are rejected
       with miss probability <= e^-lambda (config.py). Below the lambda
       bar (short docs, skewed lengths) the screen abstains.

    Only SURVIVORS join against the content table, so the verify
    exchange carries ~2 KB of fingerprints per candidate instead of two
    full contents: this is what keeps the dominant (reject) path's shuffle
    volume per-candidate-bounded at 100 TB.
    """
    if fps is None:
        # one pandas pass over the docs; persistent-index callers (the
        # store-backed pipeline, incremental ingest) pass precomputed fps
        # so previously-fingerprinted docs are never re-read
        fps = doc_fingerprints(reps, config)
    light = sig_df.select("doc_id", "sig").join(fps, "doc_id")
    n = float(config.num_perm)
    est = (
        F.aggregate(
            F.zip_with("sig_src", "sig_dst", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ).cast("double") / F.lit(n)
    )
    src_side = light.select(
        F.col("doc_id").alias("src"),
        F.col("sig").alias("sig_src"),
        F.col("fp").alias("fp_src"),
        F.col("nlen").alias("nlen_src"),
    )
    dst_side = light.select(
        F.col("doc_id").alias("dst"),
        F.col("sig").alias("sig_dst"),
        F.col("fp").alias("fp_dst"),
        F.col("nlen").alias("nlen_dst"),
    )
    min_len = F.least("nlen_src", "nlen_dst")
    threshold = F.greatest(
        F.lit(config.lcs_min_chars),
        F.floor(F.lit(config.lcs_min_ratio) * min_len).cast("int"),
    )
    rate = lambda c: F.greatest(  # noqa: E731 — mirrors doc_fingerprints
        F.lit(config.fp_min_rate),
        F.ceil(F.col(c) / F.lit(config.fp_budget)).cast("int"),
    )
    lam = (
        (threshold - F.lit(config.lcs_min_chars) + 1).cast("double")
        / F.greatest(rate("nlen_src"), rate("nlen_dst"))
    )
    jaccard_possible = F.col("est_jaccard") >= F.lit(config.jaccard_floor_gate())
    lcs_fits = threshold <= min_len
    screen_applies = (~jaccard_possible) & lcs_fits & (
        lam >= F.lit(config.fp_screen_min_lambda)
    )
    keep = (
        jaccard_possible
        | (lcs_fits & ~screen_applies)
        | (screen_applies & F.arrays_overlap("fp_src", "fp_dst"))
    )
    survivors = (
        edges.join(src_side, "src")
        .join(dst_side, "dst")
        .withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= config.prefilter_min_est_jaccard)
        .where(keep)
        .select("src", "dst", "est_jaccard")
    )
    content = reps.select("doc_id", "content")
    return (
        survivors.join(
            content.select(F.col("doc_id").alias("src"),
                           F.col("content").alias("content_src")),
            "src",
        )
        .join(
            content.select(F.col("doc_id").alias("dst"),
                           F.col("content").alias("content_dst")),
            "dst",
        )
        .select("src", "dst", "est_jaccard", "content_src", "content_dst")
    )


def verify_edges(pairs_with_content: DataFrame, config: DedupConfig,
                 num_partitions: int | None = None) -> DataFrame:
    """Score and filter candidate pairs; returns accepted edges with evidence.

    Decision per pair (the PURE documented rule — no Jaccard gate on the
    LCS path):  accepted iff  exact_jaccard >= jaccard_floor
                          OR  LCS >= max(lcs_min_chars, lcs_min_ratio*min_len)

    Cost shape (the point of this implementation): the overwhelming
    majority of candidate pairs are rejects, and a reject must never pay
    the suffix array or even an O(n) pass it doesn't need:
      1. exact Jaccard runs only when the MinHash estimate is within 4
         sigma of the floor (below that, the Jaccard branch provably —
         P < 4e-5 — cannot accept, and the LCS branch doesn't need j);
      2. a memoized LEVEL screen (Rabin-Karp window hashes at the largest
         grid level <= threshold; grid = lcs_min * 1.5^i, so the per-doc
         memo hits across pairs with different thresholds) rejects pairs
         with no level-length common run — sound, since a threshold-length
         run contains a level-length run;
      3. survivors face the EXACT O(n) probe at the pair's true threshold
         (kernels._confirm_common_run: hash hits confirmed by substring
         compare — collisions cost work, never a wrong answer);
      4. only probe-accepted pairs (real near-dups) pay the evidence-
         length computation — a binary search over the exact probe, not
         a suffix array (same value, ~5x cheaper; dominant accept cost).
    Rejected pairs report lcs=0 ("not computed"); pairs skipped by (1)
    report jaccard=-1.0 ("not computed") — downstream consumes accepted
    rows only.
    """
    _verify = make_verifier(config)
    df = pairs_with_content
    if num_partitions:
        # Hash-repartition on BOTH pair ids + sort within partitions:
        # - hash on (src, dst) load-balances by pair count — a hot pivot's
        #   edges spread across partitions instead of pinning one straggler
        #   task (measured 2->8 scaling of this stage before: 0.44);
        # - sortWithinPartitions keeps same-src pairs contiguous so the
        #   per-TASK memo (r6: generator-scope, char-budget-bounded) evicts
        #   less under its epoch clears; a hot doc re-normalizes once per
        #   partition it lands in — bounded;
        # - unlike the previous repartitionByRange, a hash exchange needs
        #   no range-boundary sampling pass, which re-evaluated the whole
        #   screens + content-join subtree a second time;
        # - 8x cores in partition count so the scheduler can balance
        #   residual per-pair cost skew (content lengths vary 40x).
        df = df.repartition(num_partitions * 8, "src", "dst") \
               .sortWithinPartitions("src", "dst")
    return df.mapInPandas(_verify, _OUT_SCHEMA)


def make_verifier(config: DedupConfig):
    """Build the per-batch verification worker (the mapInPandas callable).

    Module-level factory (rather than a closure inside verify_edges) so the
    worker is directly callable from tests and profilers without a Spark
    job; captures only scalars, so Spark serialization is unchanged.
    """
    k = config.shingle_k
    norm = config.normalize
    floor = config.jaccard_floor
    lcs_min = config.lcs_min_chars
    lcs_ratio = config.lcs_min_ratio
    # below this estimate the Jaccard branch cannot realistically accept:
    # 4 sigma under the floor at the configured signature length
    est_sd = (floor * (1.0 - floor) / config.num_perm) ** 0.5
    floor_gate = max(0.0, floor - 4.0 * est_sd)

    def _verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def level_of(threshold: int) -> int:
            lvl = lcs_min
            while int(lvl * 1.5) <= threshold:
                lvl = int(lvl * 1.5)
            return min(lvl, threshold)

        # Per-TASK memo (r6): a doc appears in ~dozens of pairs spread
        # across MANY Arrow batches (the batch size is a transfer knob, not
        # a locality unit), and the per-doc setup — normalize + RunHasher
        # prefix state + level hashes — was 60% of measured worker time
        # when rebuilt per batch (OPTIMIZATION_r06.md). The memo now lives
        # at generator scope and survives across batches, bounded by a
        # normalized-char budget: when the tracked text mass exceeds
        # _MEMO_CHAR_BUDGET every map is cleared (epoch eviction — O(1),
        # no LRU bookkeeping; derived state is ~25x the char count, so the
        # budget caps worker memory at ~130 MB regardless of corpus size).
        _MEMO_CHAR_BUDGET = 4 << 20
        texts: dict[int, str] = {}
        shingle_sets: dict[int, "np.ndarray"] = {}
        level_hashes: dict[tuple[int, int], "np.ndarray"] = {}
        hashers: dict[int, "K.RunHasher"] = {}
        memo_chars = 0

        def text_of(doc_id: int, raw: str) -> str:
            nonlocal memo_chars
            t = texts.get(doc_id)
            if t is None:
                t = K.normalize_text(raw) if norm else raw
                if memo_chars + len(t) > _MEMO_CHAR_BUDGET:
                    texts.clear()
                    shingle_sets.clear()
                    level_hashes.clear()
                    hashers.clear()
                    memo_chars = 0
                texts[doc_id] = t
                memo_chars += len(t)
            return t

        def hasher_of(doc_id: int, text: str) -> "K.RunHasher":
            # memoized rolling-hash state: encode + prefix/inverse-power
            # setup once per doc; every window length afterwards (level
            # grid, pair thresholds, binary-search midpoints) is ~3
            # vector ops instead of a fresh O(n) setup
            h = hashers.get(doc_id)
            if h is None:
                h = K.RunHasher(text)
                hashers[doc_id] = h
            return h

        def shingles_of(doc_id: int, text: str) -> "np.ndarray":
            # LAZY: the k-shingle pass costs O(k*n); ~97% of candidate
            # pairs sit below the floor gate and never need Jaccard, so
            # shingling only happens for plausible accepts
            s = shingle_sets.get(doc_id)
            if s is None:
                s = K.char_shingle_hashes(text, k)
                shingle_sets[doc_id] = s
            return s

        def levelh(doc_id: int, text: str, lvl: int) -> "np.ndarray":
            key = (doc_id, lvl)
            h = level_hashes.get(key)
            if h is None:
                h = np.sort(hasher_of(doc_id, text).hashes(lvl))
                level_hashes[key] = h
            return h

        def exact_jaccard(sa, sb) -> float:
            if sa.size == 0 and sb.size == 0:
                return 1.0
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            return inter / float(sa.size + sb.size - inter)

        for pdf in batches:
            n = len(pdf)
            jac = [-1.0] * n
            lcs = [0] * n
            ok = [False] * n
            src_ids = pdf["src"].to_numpy()
            dst_ids = pdf["dst"].to_numpy()
            raw_src = pdf["content_src"].to_numpy()
            raw_dst = pdf["content_dst"].to_numpy()
            est = (
                pdf["est_jaccard"].to_numpy()
                if "est_jaccard" in pdf.columns
                else np.full(n, 1.0)
            )
            for i in range(n):
                ca = text_of(src_ids[i], raw_src[i])
                cb = text_of(dst_ids[i], raw_dst[i])
                if est[i] >= floor_gate:
                    j = exact_jaccard(
                        shingles_of(src_ids[i], ca), shingles_of(dst_ids[i], cb)
                    )
                    jac[i] = j
                    if j >= floor:
                        ok[i] = True
                        continue
                la, lb = len(ca), len(cb)
                threshold = max(lcs_min, int(lcs_ratio * min(la, lb)))
                if threshold > min(la, lb):
                    continue  # LCS can never reach the threshold
                # sound level screen: no level-length run => no threshold run
                lvl = level_of(threshold)
                ha = levelh(src_ids[i], ca, lvl)
                hb = levelh(dst_ids[i], cb, lvl)
                if ha.size == 0 or hb.size == 0:
                    continue
                pos = np.searchsorted(hb, ha)
                pos[pos == hb.size] = hb.size - 1
                if not (hb[pos] == ha).any():
                    continue
                # exact probe at the pair's true threshold (memoized
                # rolling-hash state; confirm step is collision-proof)
                h_a = hasher_of(src_ids[i], ca)
                h_b = hasher_of(dst_ids[i], cb)
                if not K._confirm_common_run(
                    ca, cb, threshold,
                    h_a.hashes(threshold), h_b.hashes(threshold),
                ):
                    continue
                # real near-dup: record full evidence. Binary search over
                # the exact probe (threshold is known feasible) returns the
                # same max-run length as the suffix array ~5x cheaper —
                # this was the dominant verify cost once accepts are many.
                ln = K.longest_common_run_from(ca, cb, threshold,
                                               hasher_a=h_a, hasher_b=h_b)
                lcs[i] = ln
                ok[i] = ln >= threshold
                if ok[i] and jac[i] < 0.0:
                    jac[i] = exact_jaccard(
                        shingles_of(src_ids[i], ca), shingles_of(dst_ids[i], cb)
                    )
            yield pd.DataFrame(
                {"src": pdf["src"], "dst": pdf["dst"], "jaccard": jac,
                 "lcs": lcs, "accepted": ok}
            )

    return _verify
