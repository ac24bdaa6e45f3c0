"""Incremental ingest — assign clusters to a NEW batch against the existing
index without recomputing the corpus.

This is the engine's protect semantics applied at batch granularity (the
reference runs one effect per key and replays stored results; here the
"effect" is clustering one ingest batch, and previously-clustered docs are
never re-shingled):

1. the batch is fingerprinted; a ledger row under context `ingest` makes the
   whole ingest idempotent — re-submitting the same batch replays the stored
   snapshots (reference protect, DeduplicationContext.scala:95-111);
2. new docs whose sha256 already exists inherit the existing representative
   (point lookup against the hashed table — the R6 peek);
3. genuinely new contents are shingled/signed ONCE and probed against the
   persistent LSH band index and SimHash block index (new-vs-old), plus the
   capped pair generator among themselves (new-vs-new). Probes are
   scale-guarded twice:
   - PARTITION PRUNING: the bands index is hive-partitioned on
     pbucket = band_hash % N_PBUCKETS and the sim_blocks index on
     sbucket = block_val % N_SBUCKETS; each probe reads only the
     buckets the batch touches (plan-level PartitionFilters);
   - SKEW CAP: per-bucket (size, pivot) stats ride with each index; a probe
     against a bucket larger than bucket_cap emits ONE star edge to the
     bucket pivot instead of bsz pairs — the same cap/star treatment the
     batch channels apply (ADVICE r1);
4. candidates pass the same est-Jaccard prefilter + content verification;
5. connected components run over (old assignments as edges) ∪ (exact
   inheritance edges) ∪ (new verified edges), so new evidence can merge
   existing clusters, and cluster_id stays min(doc_id) of the component.

Crash safety (ADVICE r1, high): every table change of an ingest — index
appends, stats, clusters — publishes in ONE atomic catalog CAS
(TableStore.commit_many), so the re-ingest guard (left_anti on `hashed`)
can never observe a half-committed batch. Concurrency (ADVICE r2): the
replace-mode payloads (merged stats, recomputed clusters) are guarded by
the snapshots they were derived from — a racing ingest that commits first
makes this one fail with StaleReplaceError rather than silently discarding
the winner's merge; re-running the loser re-reads current state under its
ledger protection. The only crash window left is
between the catalog commit and the ledger completion record; a retry then
recomputes against an index that already contains the batch, which is a
pure no-op (the guard empties the batch, appends are empty, clusters
recompute to the identical assignment from the committed edges).

Scale note: per-batch probe cost is O(batch x bucket hit rate) with both
guards above; the index tables grow by APPEND segments (no corpus-sized
rewrite per ingest). `clusters` is LOG-STRUCTURED (VERDICT r3 #6): each
ingest appends one delta segment holding ONLY the batch's docs plus the
members of old clusters its edges touched, stamped with a monotonically
increasing `_v`; readers resolve latest-wins per doc_id via
`read_clusters`, and a semantic fold rewrites the log to one `_v`=0
segment once it crosses config.compact_segments. Connected components run
over the touched SUBGRAPH only (new edges + star edges of touched old
clusters), so both the CC input and the write are O(batch + touched), not
O(corpus). The per-bucket stats tables remain full-rewrite merges — one
row per distinct bucket, exactly the upsert an Iceberg MERGE INTO
(bands_stats/sim_stats ON band/block key) performs; the merge DELTA the
ingest computes is O(touched buckets) and is what MERGE would write.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DedupConfig
from .ledger import Ledger, Status
from .storage import TableStore
from .stages import cluster as stage_cluster
from .stages import exact as stage_exact
from .stages import minhash_lsh as stage_minhash
from .stages import simhash as stage_simhash
from .stages import verify as stage_verify

_CTX = "ingest"


def _read_latest(
    spark: SparkSession,
    store: TableStore,
    table: str,
    keys: list[str],
    prune=None,
) -> DataFrame:
    """Resolved view of a log-structured table: latest `_v` wins per key
    tuple (a delta segment supersedes earlier rows for the keys it
    rewrote). Pre-log tables (no `_v` column) read through unchanged.
    `prune` (a DataFrame->DataFrame filter) is applied BEFORE the
    resolution window — safe whenever the predicate is a function of the
    key (every version of a key shares it, e.g. a bucket partition
    column), and it is what keeps the window shuffle bounded to the
    pruned partitions instead of O(table)."""
    from pyspark.sql import Window

    df = store.read(spark, table)
    if prune is not None:
        df = prune(df)
    if "_v" not in df.columns:
        return df
    w = Window.partitionBy(*keys).orderBy(F.desc("_v"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_v")
    )


def read_clusters(spark: SparkSession, store: TableStore) -> DataFrame:
    return _read_latest(spark, store, "clusters", ["doc_id"])


def _batch_fingerprint(files: DataFrame) -> str:
    row = files.agg(
        F.coalesce(
            F.expr("bit_xor(xxhash64(repo, path, commit))"), F.lit(0)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"batch-{row['n']}-{row['h'] & 0xFFFFFFFFFFFFFFFF:016x}"


def _pair(src_col, dst_col) -> list:
    return [
        F.least(src_col, dst_col).alias("src"),
        F.greatest(src_col, dst_col).alias("dst"),
    ]


def _merge_band_stats(old: DataFrame, new: DataFrame) -> DataFrame:
    o = old.select(
        "band_id", "band_hash",
        F.col("bsz").alias("o_bsz"), F.col("pivot").alias("o_pivot"),
    )
    n = new.select(
        "band_id", "band_hash",
        F.col("bsz").alias("n_bsz"), F.col("pivot").alias("n_pivot"),
    )
    return o.join(n, ["band_id", "band_hash"], "full").select(
        "band_id", "band_hash",
        (F.coalesce("o_bsz", F.lit(0)) + F.coalesce("n_bsz", F.lit(0)))
        .alias("bsz"),
        F.least("o_pivot", "n_pivot").alias("pivot"),  # least skips nulls
    )


def _merge_sim_stats(old: DataFrame, new: DataFrame) -> DataFrame:
    o = old.select(
        "block_id", "block_val",
        F.col("bsz").alias("o_bsz"), F.col("pivot").alias("o_pivot"),
        F.col("pivot_simhash").alias("o_ps"),
    )
    n = new.select(
        "block_id", "block_val",
        F.col("bsz").alias("n_bsz"), F.col("pivot").alias("n_pivot"),
        F.col("pivot_simhash").alias("n_ps"),
    )
    new_wins = F.col("n_pivot").isNotNull() & (
        F.col("o_pivot").isNull() | (F.col("n_pivot") < F.col("o_pivot"))
    )
    return o.join(n, ["block_id", "block_val"], "full").select(
        "block_id", "block_val",
        (F.coalesce("o_bsz", F.lit(0)) + F.coalesce("n_bsz", F.lit(0)))
        .alias("bsz"),
        F.least("o_pivot", "n_pivot").alias("pivot"),
        F.when(new_wins, F.col("n_ps")).otherwise(F.col("o_ps"))
        .alias("pivot_simhash"),
    )


def _stats_stage(
    is_log: bool,
    old_touched: DataFrame,
    raw: DataFrame,
    new: DataFrame,
    merge_fn,
    bucket_fn,
    v_next: int,
    table: str,
):
    """(df, table, mode) for staging a stats upsert: log layout appends a
    touched-buckets-only delta at `_v`=v_next; a legacy full-table layout
    (no _v) migrates once via a full rewrite at the partitioned layout."""
    if is_log:
        delta = bucket_fn(merge_fn(old_touched, new)).withColumn(
            "_v", F.lit(v_next).cast("int")
        )
        return _bucket_partitioned(delta), table, "append"
    legacy_cols = [c for c in raw.columns if c not in ("pbucket", "sbucket")]
    full = bucket_fn(merge_fn(raw.select(*legacy_cols), new)).withColumn(
        "_v", F.lit(0).cast("int")
    )
    return _bucket_partitioned(full), table, "replace"


def _bucket_partitioned(df: DataFrame) -> DataFrame:
    bucket_col = "pbucket" if "pbucket" in df.columns else "sbucket"
    return df.repartition(F.col(bucket_col))


def probe_band_index(
    bands_new: DataFrame,
    bands_old: DataFrame,
    stats_old: DataFrame,
    config: DedupConfig,
) -> DataFrame:
    """New-vs-old LSH candidates, skew-capped via the persisted bucket stats:
    buckets at/below bucket_cap join in full (<= cap old rows per new row),
    hotter buckets contribute ONE star edge to their pivot."""
    probe = bands_new.join(stats_old, ["band_id", "band_hash"])
    hot = probe.where(F.col("bsz") > config.bucket_cap).select(
        *_pair(F.col("doc_id"), F.col("pivot"))
    )
    cold_keys = probe.where(F.col("bsz") <= config.bucket_cap).select(
        "band_id", "band_hash", F.col("doc_id").alias("new_id")
    )
    cold = cold_keys.join(bands_old, ["band_id", "band_hash"]).select(
        *_pair(F.col("new_id"), F.col("doc_id"))
    )
    return hot.unionByName(cold).where(F.col("src") != F.col("dst"))


def probe_block_index(
    blocks_new: DataFrame,
    blocks_old: DataFrame,
    stats_old: DataFrame,
    config: DedupConfig,
) -> DataFrame:
    """New-vs-old SimHash candidates with the same stats-based cap; the JVM
    popcount filter applies to star edges too (pivot_simhash rides in the
    stats), mirroring the batch channel's semantics."""
    radius = config.hamming_radius
    probe = blocks_new.join(stats_old, ["block_id", "block_val"])
    hot = (
        probe.where(F.col("bsz") > config.bucket_cap)
        .where(F.expr(f"bit_count(simhash ^ pivot_simhash) <= {radius}"))
        .select(*_pair(F.col("doc_id"), F.col("pivot")))
    )
    cold_keys = probe.where(F.col("bsz") <= config.bucket_cap).select(
        "block_id", "block_val",
        F.col("doc_id").alias("new_id"), F.col("simhash").alias("new_sh"),
    )
    cold = (
        cold_keys.join(blocks_old, ["block_id", "block_val"])
        .where(F.expr(f"bit_count(new_sh ^ simhash) <= {radius}"))
        .select(*_pair(F.col("new_id"), F.col("doc_id")))
    )
    return hot.unionByName(cold).where(F.col("src") != F.col("dst"))


def ingest_batch(
    spark: SparkSession,
    config: DedupConfig,
    store: TableStore,
    ledger: Ledger,
    new_files: DataFrame,
) -> DataFrame:
    """Cluster `new_files` against the existing store; returns the updated
    clusters DataFrame. Idempotent per batch (ledger-protected)."""
    batch_id = _batch_fingerprint(new_files)
    now = time.time()
    status = ledger.status(batch_id, _CTX, config.max_processing_time_s, now)
    if status is Status.COMPLETED:
        payload = json.loads(ledger.get(batch_id, _CTX).result)
        if payload.get("config_hash") == config.config_hash():
            return read_clusters(spark, store)  # replay stored result
        ledger.delete(batch_id, _CTX)
    elif status in (Status.TIMEOUT, Status.EXPIRED):
        ledger.attempt_replacing(batch_id, _CTX, ledger.get(batch_id, _CTX).started_at, now)
    else:
        ledger.create(batch_id, _CTX, now)

    # every per-ingest cache is tracked and released in the finally
    # below (ADVICE r4: repeated ingests in a long-lived driver accumulated
    # cached blocks until executor storage evicted under pressure)
    cached: list[DataFrame] = []

    def _p(df: DataFrame) -> DataFrame:
        cached.append(df.persist())
        return df

    try:
        # snapshots the guarded payloads below are DERIVED from. Captured BEFORE
        # the reads (ADVICE r3): reads pin each table's segment list at
        # DataFrame-construction time, so snapshotting first means a racing
        # commit landing in between makes `expected` look OLDER than current
        # and the CAS fails safe (StaleReplaceError) — snapshotting after the
        # reads could make `expected` match the newer state while the payloads
        # were derived from the older one, silently installing a stale merge.
        replace_base = {
            t: store.current_snapshot(t)
            for t in ("bands_stats", "sim_stats", "clusters")
        }
        hashed_old = store.read(spark, "hashed")
        reps_old = store.read(spark, "reps")
        sigs_old = store.read(spark, "signatures")
        clusters_raw = store.read(spark, "clusters")
        clusters_old = read_clusters(spark, store)

        # -- 1. hash; drop re-ingested natural keys ----------------------------
        # (safe as a re-ingest guard because ingest commits are all-or-nothing:
        # a doc_id present in `hashed` implies its index/cluster rows landed too)
        hashed_new = _p(stage_exact.hash_content(new_files).join(
            hashed_old.select("doc_id"), "doc_id", "left_anti"
        ))

        # -- 2. exact inheritance against existing contents --------------------
        sha_owner_old = hashed_old.groupBy("sha").agg(F.min("doc_id").alias("rep_id"))
        matched = _p(hashed_new.join(sha_owner_old, "sha", "left"))
        known = matched.where(F.col("rep_id").isNotNull())
        fresh = matched.where(F.col("rep_id").isNull()).drop("rep_id")

        # -- 3. within-batch exact dedup + new representatives -----------------
        fresh_owner = fresh.groupBy("sha").agg(F.min("doc_id").alias("rep_id"))
        fresh = _p(fresh.join(fresh_owner, "sha"))
        reps_new = fresh.where(F.col("doc_id") == F.col("rep_id")).drop("rep_id")

        # -- 4. signatures for new reps only (one fused UDF pass computes both
        # channels — content crosses Arrow once; bit-identical outputs) ---------
        joint_new = _p(
            stage_minhash.joint_signatures(reps_new, config, with_fp=True)
        )
        sigs_new = joint_new.select("doc_id", "sig")
        bands_new = _p(stage_minhash.band_rows(joint_new))
        sims_new = joint_new.select("doc_id", "simhash", "blocks")

        # -- 5. candidates: new-new (capped) + new-old (guarded index probe) ----
        # dedup=False: step 5's four channels union into ONE global
        # (src, dst) dropDuplicates below (see pairs_from_buckets)
        nn_lsh = stage_minhash.candidate_pairs(bands_new, config, dedup=False)

        # partition-pruned read: only pbuckets the batch touches reach the scan
        bands_new_pb = _p(stage_minhash.with_pbucket(bands_new))
        touched = [
            int(r[0]) for r in bands_new_pb.select("pbucket").distinct().collect()
        ]
        bands_old = store.read(spark, "bands").where(F.col("pbucket").isin(touched))
        # stats: prune to touched pbuckets at the SCAN, resolve latest-wins over
        # only those partitions, then keep just the buckets this batch hits —
        # the probe input AND the merge's old side are both O(batch x bands)
        new_band_stats = _p(stage_minhash.band_stats(bands_new))
        band_stats_raw = store.read(spark, "bands_stats")
        bs_is_log = "_v" in band_stats_raw.columns
        band_stats_res = _read_latest(
            spark, store, "bands_stats", ["band_id", "band_hash"],
            prune=(lambda df: df.where(F.col("pbucket").isin(touched)))
            if bs_is_log else None,
        )
        band_stats_old = _p(
            band_stats_res.join(
                new_band_stats.select("band_id", "band_hash"),
                ["band_id", "band_hash"], "left_semi",
            )
            .select("band_id", "band_hash", "bsz", "pivot")
        )
        no_lsh = probe_band_index(bands_new_pb, bands_old, band_stats_old, config)

        nn_sim = stage_simhash.candidate_pairs(sims_new, config, dedup=False)

        # partition-pruned read, mirroring the bands probe above: only the
        # sbuckets the batch touches reach the sim_blocks scan (the round-2
        # probe read the whole simhashes table per ingest — O(index) per batch)
        blocks_new = _p(stage_simhash.with_sbucket(
            stage_simhash.block_rows(sims_new)
        ))
        touched_s = [
            int(r[0]) for r in blocks_new.select("sbucket").distinct().collect()
        ]
        if store.exists("sim_blocks"):
            sim_blocks_old = store.read(spark, "sim_blocks").where(
                F.col("sbucket").isin(touched_s)
            )
            sb_stage = ("append", blocks_new.repartition(F.col("sbucket")))
        else:
            # backfill (ADVICE r3): a work dir whose simhash stage completed
            # before the sim_blocks index existed derives it ONCE from the
            # committed simhashes table, mirroring the fingerprints backfill
            sb_all = _p(stage_simhash.with_sbucket(
                stage_simhash.block_rows(store.read(spark, "simhashes"))
            ))
            sim_blocks_old = sb_all.where(F.col("sbucket").isin(touched_s))
            sb_stage = (
                "replace",
                sb_all.unionByName(blocks_new).repartition(F.col("sbucket")),
            )
        new_sim_stats = _p(stage_simhash.block_stats(sims_new))
        sim_stats_raw = store.read(spark, "sim_stats")
        ss_is_log = "_v" in sim_stats_raw.columns
        sim_stats_res = _read_latest(
            spark, store, "sim_stats", ["block_id", "block_val"],
            prune=(lambda df: df.where(F.col("sbucket").isin(touched_s)))
            if ss_is_log else None,
        )
        sim_stats_old = _p(
            sim_stats_res.join(
                new_sim_stats.select("block_id", "block_val"),
                ["block_id", "block_val"], "left_semi",
            )
            .select("block_id", "block_val", "bsz", "pivot", "pivot_simhash")
        )
        no_sim = probe_block_index(blocks_new, sim_blocks_old, sim_stats_old, config)

        cand = (
            nn_lsh.unionByName(no_lsh).unionByName(nn_sim).unionByName(no_sim)
            .dropDuplicates(["src", "dst"])
        )

        # -- 6. verification over combined reps/signatures ---------------------
        reps_all = reps_old.select("doc_id", "content").unionByName(
            reps_new.select("doc_id", "content")
        )
        sigs_all = sigs_old.select("doc_id", "sig").unionByName(
            sigs_new.select("doc_id", "sig")
        )
        # fingerprints are persisted alongside the other indexes so each ingest
        # fingerprints ONLY its new reps (ADVICE r2: the fps=None default ran
        # the pandas UDF over the whole corpus per batch); a pre-fingerprint
        # store is backfilled once, then the table grows by appends. The new
        # reps' fingerprints ride the fused signature pass (with_fp=True):
        # no second content scan of the batch.
        fps_new = joint_new.select("doc_id", "fp", "nlen")
        if store.exists("fingerprints"):
            fps_all = store.read(spark, "fingerprints").unionByName(fps_new)
            fp_stage = ("append", fps_new)
        else:
            fps_all = _p(
                stage_verify.doc_fingerprints(reps_old, config)
                .unionByName(fps_new)
            )
            fp_stage = ("replace", fps_all)
        verified = _p(stage_verify.verify_edges(
            stage_verify.prepare_pairs(cand, reps_all, sigs_all, config,
                                       fps=fps_all),
            config,
            num_partitions=config.shuffle_partitions,
        ).where("accepted"))

        # -- 7. clustering over the TOUCHED subgraph only (VERDICT r3 #6) ------
        # Only components connected to this batch can change: new edges always
        # have >= 1 new endpoint, and old components are stars onto cluster_id.
        # So CC runs over (new edges + the star edges of old clusters any new
        # edge touches) — O(batch + touched members) — and the output delta
        # rewrites exactly (batch docs + touched members), never the corpus.
        exact_edges = (
            known.select(F.col("doc_id").alias("src"), F.col("rep_id").alias("dst"))
            .unionByName(
                fresh.where(F.col("doc_id") != F.col("rep_id")).select(
                    F.col("doc_id").alias("src"), F.col("rep_id").alias("dst")
                )
            )
        )
        # O(batch) rows, referenced by three consumers (endpoints, CC input,
        # membership); eager checkpoint both avoids re-deriving the verify
        # chain per consumer and cuts the union-of-self-referencing-branches
        # plan shape that trips Catalyst's rewriteConstraints
        new_edges = exact_edges.unionByName(
            verified.select("src", "dst")
        ).localCheckpoint()
        endpoints = (
            new_edges.select(F.col("src").alias("doc_id"))
            .unionByName(new_edges.select(F.col("dst").alias("doc_id")))
            .distinct()
        )
        touched_cids = (
            clusters_old.join(endpoints, "doc_id")
            .select("cluster_id").distinct()
        )
        # O(touched) rows; eagerly checkpointed, NOT persisted: the self-join of
        # clusters_old (touched_cids is itself derived from it) inside a later
        # Union trips Catalyst's union constraint rewriting (key-not-found in
        # rewriteConstraints) — cutting the lineage here removes the self-join
        # from every downstream plan and stops CC re-deriving the probe chain
        # per iteration ([[spark-lazy-dag-recompute]])
        members_old = clusters_old.join(touched_cids, "cluster_id").localCheckpoint()
        sub_old_edges = members_old.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst"))
        labels, _ = stage_cluster.connected_components(
            new_edges.unionByName(sub_old_edges)
        )
        delta_docs = hashed_new.select("doc_id", "sha").unionByName(
            hashed_old.select("doc_id", "sha").join(
                members_old.select("doc_id"), "doc_id"
            )
        )
        assigned = (
            delta_docs.join(labels, "doc_id", "left")
            .select(
                "doc_id", "sha",
                F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            )
        )
        # method: a cluster spanning >=2 distinct contents is 'near', one content
        # 'exact' — equivalent to the batch pipeline's labeling (near components
        # always join distinct shas; exact groups share one sha). A changed
        # cluster's FULL membership is inside the delta (touched members + new
        # docs), so the span computed over the delta is the true span; untouched
        # clusters keep their stored rows and labels verbatim.
        sha_span = assigned.groupBy("cluster_id").agg(
            F.countDistinct("sha").alias("n_shas")
        )
        clusters_delta = (
            assigned.join(sha_span, "cluster_id")
            .select(
                "doc_id",
                "cluster_id",
                (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
                F.when(F.col("n_shas") >= 2, "near").otherwise("exact").alias("method"),
            )
        )
        # delta stamped one version above every committed segment; pre-log
        # stores (no _v) migrate once via a full rewrite at _v=0 + this delta
        v_next = len(store.paths("clusters"))
        clusters_delta = clusters_delta.withColumn(
            "_v", F.lit(v_next).cast("int")
        )
        if "_v" in clusters_raw.columns:
            cl_stage = ("append", clusters_delta)
        else:
            unchanged = clusters_old.join(
                clusters_delta.select("doc_id"), "doc_id", "left_anti"
            ).withColumn("_v", F.lit(0).cast("int"))
            cl_stage = ("replace", unchanged.unionByName(clusters_delta))

        # -- 8. stage everything, publish in ONE atomic catalog CAS ------------
        updates = {
            "hashed": store.stage(
                hashed_new.select(*hashed_old.columns), "hashed", "append"
            ),
            "reps": store.stage(
                reps_new.select(*reps_old.columns), "reps", "append"
            ),
            "signatures": store.stage(
                sigs_new.select("doc_id", "sig"), "signatures", "append"
            ),
            "bands": store.stage(
                bands_new_pb.repartition(F.col("pbucket")), "bands", "append",
                ["pbucket"],
            ),
            "simhashes": store.stage(
                sims_new.select("doc_id", "simhash", "blocks"), "simhashes",
                "append",
            ),
            "sim_blocks": store.stage(
                sb_stage[1], "sim_blocks", sb_stage[0], ["sbucket"],
            ),
            # stats are log-structured upserts (same treatment as clusters):
            # the delta holds ONLY the buckets this batch touched, appended at
            # the next _v; latest-wins reads supersede the old rows. A legacy
            # full-table layout (no _v) migrates once via a full rewrite —
            # appending a partitioned segment to it would poison unionByName.
            "bands_stats": store.stage(
                *_stats_stage(
                    bs_is_log, band_stats_old, band_stats_raw, new_band_stats,
                    _merge_band_stats, stage_minhash.with_pbucket,
                    len(store.paths("bands_stats")), "bands_stats",
                ),
                ["pbucket"],
            ),
            "sim_stats": store.stage(
                *_stats_stage(
                    ss_is_log, sim_stats_old, sim_stats_raw, new_sim_stats,
                    _merge_sim_stats, stage_simhash.with_sbucket,
                    len(store.paths("sim_stats")), "sim_stats",
                ),
                ["sbucket"],
            ),
            "clusters": store.stage(cl_stage[1], "clusters", cl_stage[0]),
            "fingerprints": store.stage(fp_stage[1], "fingerprints", fp_stage[0]),
        }
        store.commit_many(updates, expected=replace_base)
        snapshots = {t: store.current_snapshot(t) for t in updates}
        ledger.mark_completed(
            batch_id, _CTX,
            {"snapshots": snapshots, "config_hash": config.config_hash()},
            time.time(), config.ttl_s,
        )
        # maintenance: fold any appended index past the segment threshold back
        # to one segment (post-completion, so a crash here costs nothing; a
        # concurrent append makes compact a guarded no-op). The upsert LOGS
        # (clusters, both stats tables) get a SEMANTIC fold instead:
        # superseded rows are dropped, the survivors restamped _v=0 — the
        # Iceberg rewrite_data_files analogue for a MERGE INTO target.
        logs = {
            "clusters": (["doc_id"], None),
            "bands_stats": (["band_id", "band_hash"], ["pbucket"]),
            "sim_stats": (["block_id", "block_val"], ["sbucket"]),
        }
        for t, u in updates.items():
            if u.mode == "append" and t not in logs:
                store.compact(spark, t, min_segments=config.compact_segments)
        for t, (keys, part) in logs.items():
            _fold_log(spark, store, t, keys, config.compact_segments, part)
        return read_clusters(spark, store)
    finally:
        for df in cached:
            df.unpersist()


def _fold_log(
    spark: SparkSession,
    store: TableStore,
    table: str,
    keys: list[str],
    min_segments: int,
    partition_by: list[str] | None = None,
) -> bool:
    """Fold a log-structured table to ONE `_v`=0 segment holding only the
    latest-wins rows (superseded versions dropped — the Iceberg
    rewrite_data_files analogue for an upsert log). Guarded by the snapshot
    the fold was derived from, so a racing append turns this into a no-op
    instead of being discarded."""
    from .storage import StaleReplaceError

    segs = store.paths(table)
    if len(segs) < max(2, min_segments):
        return False
    snap = store.current_snapshot(table)
    folded = _read_latest(spark, store, table, keys).withColumn(
        "_v", F.lit(0).cast("int")
    )
    if partition_by:
        folded = folded.repartition(*[F.col(c) for c in partition_by])
    try:
        store.commit_many(
            {table: store.stage(folded, table, "replace", partition_by)},
            expected={table: snap},
        )
    except StaleReplaceError:
        return False
    return True
