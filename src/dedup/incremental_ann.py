"""Incremental embedding ingest — cluster NEW vectors against a persistent
hyperplane-LSH bucket index without re-scoring the corpus.

The minhash/simhash channels already honor the O(batch + touched) ingest
contract (incremental.py); this module extends it to the embedding-cosine
near-dup channel, the third signal a training-data pipeline dedupes on.
Same reference semantics grafted at batch granularity: a ledger row makes
each ingest idempotent (protect/replay, DeduplicationContext.scala:95-111),
commits are ONE atomic catalog CAS, and previously-ingested vectors are
never re-bucketed.

The index key is the multi-probe hyperplane bucket of the ONE-SHOT
embedding channel (ops.similarity._bucket_col/_probes_col) — not the IVF
cell of the ANN query path. Deliberate: an LSH bucket is a SIMILARITY
statement (collision implies high cosine w.h.p.), so the shared cap/star
skew machinery is sound there — a star edge to a mega-bucket's pivot
survives the tau filter exactly when the members really are near-dups. An
IVF cell is a coarse PARTITION of space: star-capping a hot cell links
dissimilar vectors whose edges the tau filter then kills, silently
fragmenting every non-pivot cluster in the cell (measured: 90 clusters
instead of 27 on a planted corpus whose largest cell crossed the cap).
Frozen-plane semantics come for free — the plane pool is deterministic
module data — so only the plane COUNT is frozen at build (emb_meta),
making an ingest sequence equal a one-shot build of the union under the
same n_planes (test-pinned).

Tables (TableStore):

- ``emb_meta`` (n_planes): the frozen bucket-space size. Widening planes
  for a grown corpus is a rebuild, exactly like re-banding MinHash.
- ``emb_vectors`` (vec_id, v, nv): vectors + norms, joined by vec_id to
  score candidate pairs; grows by appends, plain compaction.
- ``emb_buckets`` (vec_id, bucket, pbucket): the exploded multi-probe
  rows, hive-partitioned on pbucket = pmod(bucket, N_PBUCKETS_EMB) so a
  batch probe reads only the partitions its buckets land in
  (PartitionFilters at the scan — mirroring bands/pbucket and
  sim_blocks/sbucket).
- ``emb_clusters`` (vec_id, cluster_id, _v): log-structured assignment;
  each ingest appends a delta holding ONLY the batch plus the members of
  old clusters its edges touched, latest-wins reads via
  incremental._read_latest, folded to one segment past compact_segments.

new-new candidates run through the SAME skew-capped generator as every
other channel (stages/minhash_lsh.pairs_from_buckets); new-old probes are
capped by per-bucket (size, pivot) stats computed over the PRUNED
partitions only — hot buckets contribute ONE star edge to their pivot,
probe_band_index's exact treatment. Every candidate then passes the exact
rounded-cosine >= tau filter, and connected components run over the
touched subgraph only.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .incremental import _fold_log, _pair, _read_latest
from .ledger import Ledger, Status
from .ops.similarity import (
    _DIM,
    _bucket_col,
    _probes_col,
    _sim4,
    ann_n_planes,
    prep_vectors,
)
from .stages import cluster as stage_cluster
from .stages.minhash_lsh import pairs_from_buckets
from .storage import TableStore

_CTX = "ingest_emb"

# hive-partition fanout of emb_buckets; each probe touches at most
# min(batch buckets, N_PBUCKETS_EMB) partitions
N_PBUCKETS_EMB = 64


def read_emb_clusters(spark: SparkSession, store: TableStore) -> DataFrame:
    """Latest-wins view of the log-structured assignment."""
    return _read_latest(spark, store, "emb_clusters", ["vec_id"]).select(
        "vec_id", "cluster_id"
    )


def _batch_fingerprint(emb: DataFrame) -> str:
    # ADVICE r5: fold the embedding VALUES in, not just vec_id — a
    # re-submitted batch with the same ids but different vectors must not
    # replay the stored result (mirrors incremental_spans' sha2(text) fold)
    row = emb.agg(
        F.coalesce(
            F.expr("bit_xor(xxhash64(vec_id, embedding))"), F.lit(0)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"embbatch-{row['n']}-{row['h'] & 0xFFFFFFFFFFFFFFFF:016x}"


def _bucket_rows(base: DataFrame, n_planes: int) -> DataFrame:
    """(vec_id, bucket, pbucket): one row per multi-probe bucket of each
    vector — the symmetric probing of the one-shot channel, so two vectors
    meet whenever their sign buckets are within the probe radius."""
    b = _bucket_col(F.col("v"), n_planes)
    return (
        base.select(
            "vec_id", F.explode(_probes_col(b, n_planes)).alias("bucket")
        )
        .withColumn(
            "pbucket",
            F.pmod(F.col("bucket"), F.lit(N_PBUCKETS_EMB)).cast("int"),
        )
    )


def _tau_edges(pairs: DataFrame, vecs: DataFrame, tau: float) -> DataFrame:
    """Exact rounded-cosine filter over candidate (src, dst) pairs."""
    return (
        pairs.join(
            vecs.select(
                F.col("vec_id").alias("src"), F.col("v").alias("v_src"),
                F.col("nv").alias("n_src"),
            ),
            "src",
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("dst"), F.col("v").alias("v_dst"),
                F.col("nv").alias("n_dst"),
            ),
            "dst",
        )
        .where(
            _sim4(
                F.col("v_src"), F.col("v_dst"),
                F.col("n_src"), F.col("n_dst"),
            ) >= tau
        )
        .select("src", "dst")
    )


def build_embedding_index(
    spark: SparkSession,
    config: DedupConfig,
    store: TableStore,
    emb: DataFrame,
    tau: float,
    n_planes: int | None = None,
) -> DataFrame:
    """Build the persistent bucket index + initial clusters from a base
    corpus (columns vec_id, embedding). n_planes defaults to the occupancy
    sizing the one-shot channel uses (ann_n_planes) and is FROZEN into
    emb_meta — every later ingest buckets under it. Returns the clusters
    DataFrame."""
    base = prep_vectors(emb).persist()
    try:
        first = base.select(F.size("v").alias("d")).first()
        if first is not None and first["d"] != _DIM:
            raise ValueError(
                f"embedding dim {first['d']} != plane-pool dim {_DIM}: the "
                "hyperplane pool is fixed-dimension; zip_with against a "
                "shorter vector NULLs every dot and collapses all buckets "
                "to 0"
            )
        if n_planes is None:
            n_planes = ann_n_planes(base.count())
        rows = _bucket_rows(base, n_planes)
        pairs = pairs_from_buckets(
            rows.withColumnRenamed("vec_id", "doc_id"), ["bucket"], config
        ).select("src", "dst")
        edges = _tau_edges(pairs, base, tau)
        labels, _ = stage_cluster.connected_components(edges)
        clusters = (
            base.select("vec_id")
            .join(
                labels.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
            )
            .select(
                "vec_id",
                F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            )
            .withColumn("_v", F.lit(0).cast("int"))
        )
        meta = spark.createDataFrame([(int(n_planes),)], "n_planes int")
        store.commit_many({
            "emb_meta": store.stage(meta, "emb_meta", "replace"),
            "emb_vectors": store.stage(
                base.select("vec_id", "v", "nv"), "emb_vectors", "replace"
            ),
            "emb_buckets": store.stage(
                rows.repartition(F.col("pbucket")), "emb_buckets",
                "replace", ["pbucket"],
            ),
            "emb_clusters": store.stage(clusters, "emb_clusters", "replace"),
        })
        return read_emb_clusters(spark, store)
    finally:
        base.unpersist()


def probe_bucket_index(
    rows_new: DataFrame,
    buckets_old_pruned: DataFrame,
    config: DedupConfig,
) -> DataFrame:
    """New-vs-old candidates with probe_band_index's stats-based cap:
    buckets at/below bucket_cap join in full (<= cap old rows per new row);
    hotter buckets contribute ONE star edge to their pivot (sound here: an
    LSH bucket is a similarity bucket, and the tau filter validates every
    edge). Sizes come from the PRUNED partitions only — every row of a
    bucket lives in its pbucket partition, so these are exact bucket sizes
    at O(touched partitions) cost, never O(index)."""
    stats = buckets_old_pruned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bsz"), F.min("vec_id").alias("pivot")
    )
    probe = rows_new.select("vec_id", "bucket").join(stats, "bucket")
    hot = probe.where(F.col("bsz") > config.bucket_cap).select(
        *_pair(F.col("vec_id"), F.col("pivot"))
    )
    cold_keys = probe.where(F.col("bsz") <= config.bucket_cap).select(
        "bucket", F.col("vec_id").alias("new_id")
    )
    cold = cold_keys.join(
        buckets_old_pruned.select("bucket", "vec_id"), "bucket"
    ).select(*_pair(F.col("new_id"), F.col("vec_id")))
    return hot.unionByName(cold).where(F.col("src") != F.col("dst"))


def ingest_embeddings(
    spark: SparkSession,
    config: DedupConfig,
    store: TableStore,
    ledger: Ledger,
    new_emb: DataFrame,
    tau: float,
) -> DataFrame:
    """Cluster `new_emb` against the existing index; returns the updated
    clusters DataFrame. Idempotent per batch (ledger-protected); commits in
    ONE atomic catalog CAS guarded by the emb_clusters snapshot."""
    batch_id = _batch_fingerprint(new_emb)
    now = time.time()
    status = ledger.status(batch_id, _CTX, config.max_processing_time_s, now)
    if status is Status.COMPLETED:
        payload = json.loads(ledger.get(batch_id, _CTX).result)
        if payload.get("config_hash") == config.config_hash():
            return read_emb_clusters(spark, store)  # replay stored result
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
        # snapshot BEFORE the reads: a racing commit landing in between makes
        # `expected` look older than current and the CAS fails safe
        # (StaleReplaceError), never silently installing a stale merge
        replace_base = {"emb_clusters": store.current_snapshot("emb_clusters")}
        vectors_old = store.read(spark, "emb_vectors")
        n_planes = int(store.read_pandas("emb_meta")["n_planes"].iloc[0])
        clusters_old = read_emb_clusters(spark, store)

        # -- 0. dimension guard (ADVICE r5): build_embedding_index raises on
        # dim != _DIM, but a wrong-dim ingest batch would silently bucket
        # every vector to 0 (zip_with NULLs the dot) and commit the bad rows
        # permanently. Fail fast on the first row instead.
        bad = new_emb.select(F.size("embedding").alias("d")).head(1)
        if bad and int(bad[0]["d"]) != _DIM:
            raise ValueError(
                f"ingest_embeddings: embedding dim {int(bad[0]['d'])} != "
                f"index dim {_DIM}"
            )

        # -- 1. drop re-ingested vec_ids (commits are all-or-nothing, so a
        # vec_id in emb_vectors implies its bucket/cluster rows landed too)
        fresh = _p(
            prep_vectors(new_emb).join(
                vectors_old.select("vec_id"), "vec_id", "left_anti"
            )
        )

        # -- 2. bucket under the FROZEN plane count --------------------------
        rows_new = _p(_bucket_rows(fresh, n_planes))

        # -- 3. candidates: new-new (capped) + new-old (pruned probe) -------
        touched = [
            int(r[0]) for r in rows_new.select("pbucket").distinct().collect()
        ]
        buckets_old = _p(
            store.read(spark, "emb_buckets")
            .where(F.col("pbucket").isin(touched))
            .join(rows_new.select("bucket").distinct(), "bucket", "left_semi")
        )
        nn = pairs_from_buckets(
            rows_new.withColumnRenamed("vec_id", "doc_id"), ["bucket"],
            config, dedup=False,
        ).select("src", "dst")
        cand = (
            nn.unionByName(probe_bucket_index(rows_new, buckets_old, config))
            .dropDuplicates(["src", "dst"])
        )

        # -- 4. exact cosine >= tau ----------------------------------------
        vecs = vectors_old.select("vec_id", "v", "nv").unionByName(
            fresh.select("vec_id", "v", "nv")
        )
        new_edges = _tau_edges(cand, vecs, tau).localCheckpoint()

        # -- 5. CC over the touched subgraph only ---------------------------
        # only components connected to this batch can change: new edges have
        # >= 1 new endpoint, old components collapse to stars on cluster_id
        endpoints = (
            new_edges.select(F.col("src").alias("vec_id"))
            .unionByName(new_edges.select(F.col("dst").alias("vec_id")))
            .distinct()
        )
        touched_cids = (
            clusters_old.join(endpoints, "vec_id")
            .select("cluster_id").distinct()
        )
        members_old = clusters_old.join(
            touched_cids, "cluster_id"
        ).localCheckpoint()
        sub_old_edges = members_old.where(
            F.col("vec_id") != F.col("cluster_id")
        ).select(
            F.col("vec_id").alias("src"), F.col("cluster_id").alias("dst")
        )
        labels, _ = stage_cluster.connected_components(
            new_edges.unionByName(sub_old_edges)
        )

        # -- 6. delta = batch + touched members, stamped at the next _v -----
        delta_ids = fresh.select("vec_id").unionByName(
            members_old.select("vec_id")
        )
        v_next = len(store.paths("emb_clusters"))
        clusters_delta = (
            delta_ids.join(
                labels.withColumnRenamed("doc_id", "vec_id"), "vec_id", "left"
            )
            .select(
                "vec_id",
                F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            )
            .withColumn("_v", F.lit(v_next).cast("int"))
        )

        # -- 7. ONE atomic catalog CAS --------------------------------------
        updates = {
            "emb_vectors": store.stage(
                fresh.select("vec_id", "v", "nv"), "emb_vectors", "append"
            ),
            "emb_buckets": store.stage(
                rows_new.repartition(F.col("pbucket")), "emb_buckets",
                "append", ["pbucket"],
            ),
            "emb_clusters": store.stage(
                clusters_delta, "emb_clusters", "append"
            ),
        }
        store.commit_many(updates, expected=replace_base)
        snapshots = {t: store.current_snapshot(t) for t in updates}
        ledger.mark_completed(
            batch_id, _CTX,
            {"snapshots": snapshots, "config_hash": config.config_hash()},
            time.time(), config.ttl_s,
        )
        # maintenance: semantic fold of the assignment log past the segment
        # threshold; the vector/bucket indexes get plain compactions
        _fold_log(
            spark, store, "emb_clusters", ["vec_id"], config.compact_segments
        )
        store.compact(
            spark, "emb_vectors", min_segments=config.compact_segments
        )
        store.compact(
            spark, "emb_buckets", min_segments=config.compact_segments
        )
        return read_emb_clusters(spark, store)
    finally:
        for df in cached:
            df.unpersist()
