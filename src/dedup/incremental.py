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
   persistent LSH band index and SimHash block index with plain equi-joins
   (new-vs-old), plus the capped pair generator among themselves
   (new-vs-new);
4. candidates pass the same est-Jaccard prefilter + content verification;
5. connected components run over (old assignments as edges) ∪ (exact
   inheritance edges) ∪ (new verified edges), so new evidence can merge
   existing clusters, and cluster_id stays min(doc_id) of the component.

Scale note: step 3 is the whole point — the per-batch cost is
O(batch x bucket hit rate), independent of corpus size; the bands/simhashes
tables ARE the index and grow with the corpus (32 + 4 rows per rep), which
is what a production LSH index costs anywhere.
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


def _batch_fingerprint(files: DataFrame) -> str:
    row = files.agg(
        F.coalesce(
            F.expr("bit_xor(xxhash64(repo, path, commit))"), F.lit(0)
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"batch-{row['n']}-{row['h'] & 0xFFFFFFFFFFFFFFFF:016x}"


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
            return store.read(spark, "clusters")  # replay stored result
        ledger.delete(batch_id, _CTX)
    elif status in (Status.TIMEOUT, Status.EXPIRED):
        ledger.attempt_replacing(batch_id, _CTX, ledger.get(batch_id, _CTX).started_at, now)
    else:
        ledger.create(batch_id, _CTX, now)

    hashed_old = store.read(spark, "hashed")
    reps_old = store.read(spark, "reps")
    sigs_old = store.read(spark, "signatures")
    bands_old = store.read(spark, "bands")
    sims_old = store.read(spark, "simhashes")
    clusters_old = store.read(spark, "clusters")

    # -- 1. hash; drop re-ingested natural keys ----------------------------
    hashed_new = stage_exact.hash_content(new_files).join(
        hashed_old.select("doc_id"), "doc_id", "left_anti"
    ).persist()

    # -- 2. exact inheritance against existing contents --------------------
    sha_owner_old = hashed_old.groupBy("sha").agg(F.min("doc_id").alias("rep_id"))
    matched = hashed_new.join(sha_owner_old, "sha", "left").persist()
    known = matched.where(F.col("rep_id").isNotNull())
    fresh = matched.where(F.col("rep_id").isNull()).drop("rep_id")

    # -- 3. within-batch exact dedup + new representatives -----------------
    fresh_owner = fresh.groupBy("sha").agg(F.min("doc_id").alias("rep_id"))
    fresh = fresh.join(fresh_owner, "sha").persist()
    reps_new = fresh.where(F.col("doc_id") == F.col("rep_id")).drop("rep_id")

    # -- 4. signatures for new reps only ------------------------------------
    sigs_new = stage_minhash.signatures(reps_new, config).persist()
    bands_new = stage_minhash.band_rows(sigs_new).persist()
    sims_new = stage_simhash.simhashes(reps_new, config).persist()

    # -- 5. candidates: new-new (capped) + new-old (index probe) -----------
    nn_lsh = stage_minhash.candidate_pairs(bands_new, config)
    no_lsh = (
        bands_new.join(bands_old, ["band_id", "band_hash"], "inner")
        .select(
            F.least(bands_new.doc_id, bands_old.doc_id).alias("src"),
            F.greatest(bands_new.doc_id, bands_old.doc_id).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    nn_sim = stage_simhash.candidate_pairs(sims_new, config)
    blocks_new = sims_new.select(
        "doc_id", "simhash", F.posexplode("blocks").alias("block_id", "block_val")
    )
    blocks_old = sims_old.select(
        "doc_id", "simhash", F.posexplode("blocks").alias("block_id", "block_val")
    )
    no_sim = (
        blocks_new.alias("n").join(
            blocks_old.alias("o"), ["block_id", "block_val"], "inner"
        )
        .where(F.expr(f"bit_count(n.simhash ^ o.simhash) <= {config.hamming_radius}"))
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("src"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
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
    verified = stage_verify.verify_edges(
        stage_verify.prepare_pairs(cand, reps_all, sigs_all, config),
        config,
        num_partitions=config.shuffle_partitions,
    ).where("accepted").persist()

    # -- 7. clustering over old assignments + new evidence -----------------
    old_edges = clusters_old.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("src"), F.col("cluster_id").alias("dst")
    )
    exact_edges = (
        known.select(F.col("doc_id").alias("src"), F.col("rep_id").alias("dst"))
        .unionByName(
            fresh.where(F.col("doc_id") != F.col("rep_id")).select(
                F.col("doc_id").alias("src"), F.col("rep_id").alias("dst")
            )
        )
    )
    all_edges = (
        old_edges.unionByName(exact_edges)
        .unionByName(verified.select("src", "dst"))
    )
    labels, _ = stage_cluster.connected_components(all_edges)
    all_docs = hashed_old.select("doc_id", "sha").unionByName(
        hashed_new.select("doc_id", "sha")
    )
    assigned = (
        all_docs.join(labels, "doc_id", "left")
        .select(
            "doc_id", "sha",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    # method: a cluster spanning >=2 distinct contents is 'near', one content
    # 'exact' — equivalent to the batch pipeline's labeling (near components
    # always join distinct shas; exact groups share one sha).
    sha_span = assigned.groupBy("cluster_id").agg(
        F.countDistinct("sha").alias("n_shas")
    )
    clusters = (
        assigned.join(sha_span, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
            F.when(F.col("n_shas") >= 2, "near").otherwise("exact").alias("method"),
        )
    )

    # -- 8. commit new snapshots (index grows), then the ledger row --------
    snapshots = {
        "hashed": store.write(
            hashed_old.unionByName(hashed_new.select(*hashed_old.columns)), "hashed"
        ),
        "reps": store.write(
            reps_old.unionByName(reps_new.select(*reps_old.columns)), "reps"
        ),
        "signatures": store.write(
            sigs_old.select("doc_id", "sig").unionByName(
                sigs_new.select("doc_id", "sig")), "signatures"
        ),
        "bands": store.write(bands_old.unionByName(bands_new), "bands"),
        "simhashes": store.write(
            sims_old.unionByName(sims_new.select(*sims_old.columns)), "simhashes"
        ),
        "clusters": store.write(clusters, "clusters"),
    }
    ledger.mark_completed(
        batch_id, _CTX,
        {"snapshots": snapshots, "config_hash": config.config_hash()},
        time.time(), config.ttl_s,
    )
    return store.read(spark, "clusters")
