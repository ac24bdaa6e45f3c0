"""Incremental duplicated-SPAN ingest — maintain the corpus-wide
duplicated-substring statistics as new documents arrive, without rescanning
old content.

Completes the O(batch + touched) ingest contract across ALL four dedup
channels: minhash/simhash (incremental.py), embedding-cosine
(incremental_ann.py), and now the duplicated-span channel (ops/spans.py —
Lee-et-al exact substring dedup via mod-p winnowed rolling hashes). Same
reference semantics grafted at batch granularity: a ledger row makes each
ingest idempotent (protect/replay, DeduplicationContext.scala:95-111),
commits are ONE atomic catalog CAS, and previously-ingested documents are
never re-hashed.

Why this is O(batch + touched): a batch can change an OLD document's stats
in exactly one way — a window hash that previously lived in ONE document
gains a second document, flipping that document's positions for that hash
from clean to duplicated. Every such hash is in the batch, so the update
reads only the index partitions the batch's hashes land in
(hive-partitioned pbucket pruning, the bands/pbucket idiom) and rewrites
stats rows only for the batch docs plus the flipped old docs, appended as
a log-structured delta (latest-wins reads, semantic fold past
compact_segments). Old content is NEVER re-read: the index stores per
(h, doc) position counts, which is all the flip needs.

Tables (TableStore):

- ``span_meta`` (L, p): the frozen window length and sampling rate.
  Changing either is a rebuild (the hashes are incomparable), exactly like
  re-banding MinHash.
- ``span_index`` (pbucket, h, doc_id, cnt): distinct sampled (hash, doc)
  pairs with their position counts, hive-partitioned on
  pbucket = pmod(h, N_PBUCKETS_SPANS); grows by appends, plain compaction.
- ``span_stats`` (doc_id, n_spans, n_dup_spans, _v): log-structured
  per-doc stats deltas; `read_span_stats` folds latest-wins and derives
  dup_ratio with ops.spans' exact rounding, so an ingest sequence is
  row-identical to the one-shot `doc_dup_span_stats` over the union
  corpus (test-pinned).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .incremental import _fold_log, _read_latest
from .ledger import Ledger, Status
from .ops.spans import SPAN_L, SPAN_P, sampled_span_hashes
from .storage import TableStore

_CTX = "ingest_spans"

# hive-partition fanout of span_index; a batch probe reads at most
# min(distinct batch pbuckets, N_PBUCKETS_SPANS) partitions
N_PBUCKETS_SPANS = 64


def read_span_stats(spark: SparkSession, store: TableStore) -> DataFrame:
    """Latest-wins view of the log-structured stats, with dup_ratio derived
    exactly as ops.spans.doc_dup_span_stats derives it."""
    latest = _read_latest(spark, store, "span_stats", ["doc_id"])
    return latest.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        (F.floor(F.col("n_dup_spans") / F.col("n_spans") * 10000
                 + F.lit(0.5)) / 10000).alias("dup_ratio"),
    )


def _batch_fingerprint(docs: DataFrame) -> str:
    row = docs.agg(
        F.coalesce(
            F.expr("bit_xor(xxhash64(doc_id, sha2(text, 256)))"), F.lit(0)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"spanbatch-{row['n']}-{row['h'] & 0xFFFFFFFFFFFFFFFF:016x}"


def _per_doc_hash_counts(docs: DataFrame, L: int, p: int) -> DataFrame:
    """(h, doc_id, cnt, pbucket): distinct sampled (hash, doc) pairs with
    position counts — the index row shape."""
    return (
        sampled_span_hashes(docs, L=L, p=p)
        .groupBy("h", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "pbucket",
            F.pmod(F.col("h"), F.lit(N_PBUCKETS_SPANS)).cast("int"),
        )
    )


def _stats_from_index_rows(per_doc: DataFrame) -> DataFrame:
    """One-shot stats over (h, doc_id, cnt) rows — the batch query's
    window-flag fold (ops.spans.doc_dup_span_stats), reused by build."""
    from pyspark.sql import Window

    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    return (
        per_doc.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_spans"),
            F.sum(
                F.when(F.col("nd") >= 2, F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_dup_spans"),
        )
    )


def build_span_index(
    spark: SparkSession,
    config: DedupConfig,
    store: TableStore,
    docs: DataFrame,
    L: int = SPAN_L,
    p: int = SPAN_P,
) -> DataFrame:
    """Build the persistent span index + initial stats from a base corpus
    (columns doc_id, text). L and p are FROZEN into span_meta; every later
    ingest samples under them. Returns the stats DataFrame."""
    per_doc = _per_doc_hash_counts(
        docs.select("doc_id", "text"), L, p
    ).persist()
    try:
        stats = _stats_from_index_rows(per_doc).withColumn(
            "_v", F.lit(0).cast("int")
        )
        meta = spark.createDataFrame([(int(L), int(p))], "L int, p int")
        store.commit_many({
            "span_meta": store.stage(meta, "span_meta", "replace"),
            "span_index": store.stage(
                per_doc.repartition(F.col("pbucket")), "span_index",
                "replace", ["pbucket"],
            ),
            "span_stats": store.stage(stats, "span_stats", "replace"),
        })
        return read_span_stats(spark, store)
    finally:
        per_doc.unpersist()


def ingest_spans(
    spark: SparkSession,
    config: DedupConfig,
    store: TableStore,
    ledger: Ledger,
    new_docs: DataFrame,
) -> DataFrame:
    """Fold `new_docs` (doc_id, text) into the span index and stats;
    returns the updated stats DataFrame. Idempotent per batch
    (ledger-protected); commits in ONE atomic catalog CAS guarded by the
    span_stats snapshot."""
    batch_id = _batch_fingerprint(new_docs.select("doc_id", "text"))
    now = time.time()
    status = ledger.status(batch_id, _CTX, config.max_processing_time_s, now)
    if status is Status.COMPLETED:
        payload = json.loads(ledger.get(batch_id, _CTX).result)
        if payload.get("config_hash") == config.config_hash():
            return read_span_stats(spark, store)  # replay stored result
        ledger.delete(batch_id, _CTX)
    elif status in (Status.TIMEOUT, Status.EXPIRED):
        ledger.attempt_replacing(
            batch_id, _CTX, ledger.get(batch_id, _CTX).started_at, now
        )
    else:
        ledger.create(batch_id, _CTX, now)

    cached: list[DataFrame] = []

    def _p(df: DataFrame) -> DataFrame:
        cached.append(df.persist())
        return df

    try:
        # snapshot BEFORE the reads (fail-safe CAS; see incremental_ann)
        replace_base = {"span_stats": store.current_snapshot("span_stats")}
        meta = store.read_pandas("span_meta")
        L, p = int(meta["L"].iloc[0]), int(meta["p"].iloc[0])
        stats_old = _read_latest(spark, store, "span_stats", ["doc_id"])

        # -- 1. drop re-ingested doc_ids (commits are all-or-nothing, so a
        # doc_id in span_stats implies its index rows landed too; docs with
        # zero sampled windows re-hash to nothing — harmless)
        fresh = new_docs.select("doc_id", "text").join(
            stats_old.select("doc_id"), "doc_id", "left_anti"
        )

        # -- 2. sample under the FROZEN (L, p) -------------------------------
        per_new = _p(_per_doc_hash_counts(fresh, L, p))

        # -- 3. pruned probe: old index rows in the batch's pbuckets, for
        # the batch's hashes only ------------------------------------------
        touched = [
            int(r[0]) for r in per_new.select("pbucket").distinct().collect()
        ]
        index_matched = _p(
            store.read(spark, "span_index")
            .where(F.col("pbucket").isin(touched))
            .join(per_new.select("h").distinct(), "h", "left_semi")
        )

        # -- 4. per-hash doc counts on both sides ----------------------------
        old_h = index_matched.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_docs_old")
        )
        new_h = per_new.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_docs_new")
        )

        # -- 5. batch-doc stats: a position is duplicated when its hash
        # exists in the old corpus OR in a second batch doc -----------------
        flagged_new = (
            per_new.join(new_h, "h")
            .join(old_h, "h", "left")
            .withColumn(
                "dup",
                (F.coalesce("n_docs_old", F.lit(0)) >= 1)
                | (F.col("n_docs_new") >= 2),
            )
        )
        stats_new = flagged_new.groupBy("doc_id").agg(
            F.sum("cnt").alias("n_spans"),
            F.sum(F.when(F.col("dup"), F.col("cnt")).otherwise(F.lit(0)))
            .alias("n_dup_spans"),
        )

        # -- 6. flipped OLD docs: a hash that had exactly ONE old doc and
        # gained a batch doc flips that old doc's positions to duplicated.
        # (n_docs_old >= 2 hashes were already duplicated for every old
        # holder; nothing changes.) ------------------------------------------
        flips = (
            index_matched.join(
                old_h.where(F.col("n_docs_old") == 1), "h", "left_semi"
            )
            .groupBy("doc_id")
            .agg(F.sum("cnt").alias("flip_cnt"))
        )
        stats_flipped = (
            flips.join(stats_old, "doc_id")
            .select(
                "doc_id",
                "n_spans",
                (F.col("n_dup_spans") + F.col("flip_cnt"))
                .alias("n_dup_spans"),
            )
        )

        # -- 7. delta = batch docs + flipped old docs, next _v ---------------
        v_next = len(store.paths("span_stats"))
        delta = (
            stats_new.unionByName(stats_flipped)
            .withColumn("_v", F.lit(v_next).cast("int"))
        )

        # -- 8. ONE atomic catalog CAS ----------------------------------------
        updates = {
            "span_index": store.stage(
                per_new.repartition(F.col("pbucket")), "span_index",
                "append", ["pbucket"],
            ),
            "span_stats": store.stage(delta, "span_stats", "append"),
        }
        store.commit_many(updates, expected=replace_base)
        snapshots = {t: store.current_snapshot(t) for t in updates}
        ledger.mark_completed(
            batch_id, _CTX,
            {"snapshots": snapshots, "config_hash": config.config_hash()},
            time.time(), config.ttl_s,
        )
        # maintenance: semantic fold of the stats log past the segment
        # threshold; the index gets plain compaction
        _fold_log(
            spark, store, "span_stats", ["doc_id"], config.compact_segments
        )
        store.compact(
            spark, "span_index", min_segments=config.compact_segments
        )
        return read_span_stats(spark, store)
    finally:
        for df in cached:
            df.unpersist()
