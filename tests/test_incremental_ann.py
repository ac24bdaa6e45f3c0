"""Incremental embedding ingest: frozen-plane equivalence, ledger
idempotence, O(batch + touched) delta bounds, cluster merging, partitioned
index layout.

The equivalence oracle is build_embedding_index itself: the hyperplane
pool is deterministic module data and the plane COUNT is frozen in
emb_meta, so a one-shot build over base ∪ batch buckets every vector
identically to the incremental sequence — ingest must reproduce the
one-shot clustering exactly (no bucket here crosses the cap, so the
cap/star boundary cannot make the candidate sets order-dependent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.incremental_ann import (
    build_embedding_index,
    ingest_embeddings,
    read_emb_clusters,
)
from dedup.ledger import Ledger
from dedup.storage import TableStore

CFG = DedupConfig(shuffle_partitions=8)
TAU = 0.90
N_PLANES = 8
N_CENTERS, PER = 30, 8          # 240 vectors
N_BASE = 190                    # center 23 (ids 184..191) straddles the split


def _emb_pdf(n_centers=N_CENTERS, per=PER, noise=0.03, seed=11, dim=64):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in rng.standard_normal((n_centers, dim)):
        for _ in range(per):
            v = c + noise * rng.standard_normal(dim)
            rows.append(
                (vid, (v / np.linalg.norm(v)).astype("float32").tolist())
            )
            vid += 1
    return pd.DataFrame(rows, columns=["vec_id", "embedding"])


def _pairs(cl: pd.DataFrame) -> set[tuple[int, int]]:
    out = set()
    for _, grp in cl.groupby("cluster_id"):
        ids = sorted(grp.vec_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.add((ids[i], ids[j]))
    return out


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    pdf = _emb_pdf()
    base_pdf = pdf.iloc[:N_BASE].reset_index(drop=True)
    batch_pdf = pdf.iloc[N_BASE:].reset_index(drop=True)
    work = tmp_path_factory.mktemp("emb_incr")
    store = TableStore(work / "tables")
    ledger = Ledger(work / "ledger")
    build_embedding_index(
        spark, CFG, store, spark.createDataFrame(base_pdf), TAU,
        n_planes=N_PLANES,
    )
    base_clusters = read_emb_clusters(spark, store).toPandas()
    segs_before = len(store.paths("emb_clusters"))
    out = ingest_embeddings(
        spark, CFG, store, ledger, spark.createDataFrame(batch_pdf), TAU
    ).toPandas()
    return {
        "pdf": pdf, "batch_pdf": batch_pdf, "store": store, "ledger": ledger,
        "base_clusters": base_clusters, "out": out,
        "segs_before": segs_before,
    }


def test_recovers_planted_clusters(ingested):
    """Sanity anchor independent of the one-shot oracle: the planted
    clusters (within-cos ~0.999, cross-cos ~0) must come back exactly —
    one cluster per center, keyed by its min member id."""
    out = ingested["out"]
    assert len(out) == N_CENTERS * PER
    got = {
        cid: sorted(grp.vec_id) for cid, grp in out.groupby("cluster_id")
    }
    expect = {
        c * PER: list(range(c * PER, (c + 1) * PER)) for c in range(N_CENTERS)
    }
    assert got == expect


def test_matches_oneshot_under_frozen_planes(spark, ingested, tmp_path):
    """Ingest(base)+ingest(batch) == one-shot build over the union under
    the same frozen n_planes: partitions agree pair-for-pair."""
    store2 = TableStore(tmp_path / "oneshot")
    oneshot = build_embedding_index(
        spark, CFG, store2, spark.createDataFrame(ingested["pdf"]), TAU,
        n_planes=N_PLANES,
    ).toPandas()
    assert _pairs(ingested["out"]) == _pairs(oneshot)


def test_straddling_cluster_absorbs_batch_members(ingested):
    """Center 23 (vec_ids 184..191) straddles the split: its two batch
    members must land in the cluster its base members already formed."""
    out = ingested["out"]
    cids = set(out[out.vec_id.isin(range(184, 192))].cluster_id)
    assert cids == {184}  # min member id stays the cluster id


def test_reingest_is_ledger_replay(spark, ingested):
    """Re-submitting the identical batch replays the stored result: same
    clusters, NO new index or log segments."""
    store, ledger = ingested["store"], ingested["ledger"]
    vec_segs = len(store.paths("emb_vectors"))
    bkt_segs = len(store.paths("emb_buckets"))
    log_segs = len(store.paths("emb_clusters"))
    again = ingest_embeddings(
        spark, CFG, store, ledger,
        spark.createDataFrame(ingested["batch_pdf"]), TAU,
    ).toPandas()
    assert _pairs(again) == _pairs(ingested["out"])
    assert len(store.paths("emb_vectors")) == vec_segs
    assert len(store.paths("emb_buckets")) == bkt_segs
    assert len(store.paths("emb_clusters")) == log_segs


def test_delta_is_batch_plus_touched_only(spark, ingested):
    """The appended assignment segment holds the batch plus the members of
    touched old clusters — never the corpus. Here only center 23 straddles,
    so the delta is 50 batch rows + its 6 base members."""
    store = ingested["store"]
    segs = store.paths("emb_clusters")
    assert len(segs) == ingested["segs_before"] + 1
    delta = spark.read.parquet(segs[-1]).toPandas()
    n_batch = len(ingested["batch_pdf"])
    assert n_batch <= len(delta) <= n_batch + 6
    # untouched base clusters keep their stored rows verbatim
    base_ids = set(range(184)) - set(delta.vec_id)
    base_cl = ingested["base_clusters"]
    out = ingested["out"]
    merged = base_cl[base_cl.vec_id.isin(base_ids)].merge(
        out, on="vec_id", suffixes=("_base", "_out")
    )
    assert (merged.cluster_id_base == merged.cluster_id_out).all()


def test_index_layout_partitioned_on_pbucket(ingested):
    store = ingested["store"]
    assert store.partition_cols("emb_buckets") == ["pbucket"]
    assert store.partition_cols("emb_vectors") == []


def test_batch_edge_merges_two_old_clusters(spark, tmp_path):
    """A new vector similar to BOTH of two existing clusters must merge
    them (the touched-subgraph CC re-labels every member, old and new).
    Geometry: X at 0 deg, Y at 30 deg in the (e1, e2) plane, mid at
    15 deg — cos(mid, X) = cos(mid, Y) = 0.966 >= tau, cos(X, Y) =
    0.866 < tau, and the mid bucket sits within the probe radius of both
    clusters' buckets at a dense plane count."""
    def _vec(deg):
        r = np.deg2rad(deg)
        return [float(np.cos(r)), float(np.sin(r))] + [0.0] * 62

    base = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [_vec(0), _vec(1), _vec(30), _vec(29)],
    })
    batch = pd.DataFrame({"vec_id": [10], "embedding": [_vec(15)]})
    store = TableStore(tmp_path / "tables")
    ledger = Ledger(tmp_path / "ledger")
    tau = 0.95  # within-cluster cos(1 deg)=0.9998; cross cos(30 deg)=0.866
    build_embedding_index(
        spark, CFG, store, spark.createDataFrame(base), tau, n_planes=4
    )
    before = read_emb_clusters(spark, store).toPandas()
    assert set(
        map(tuple, before[["vec_id", "cluster_id"]].itertuples(index=False))
    ) == {(0, 0), (1, 0), (2, 2), (3, 2)}
    out = ingest_embeddings(
        spark, CFG, store, ledger, spark.createDataFrame(batch), tau
    ).toPandas()
    assert set(out.cluster_id) == {0}
    assert set(out.vec_id) == {0, 1, 2, 3, 10}
