"""Incremental ingest: batch clustering against the existing index.

The equivalence oracle is the batch pipeline itself: clustering corpus A
then ingesting batch B must (a) place B's exact copies and near-dup variants
into A's clusters, (b) keep untouched A clusters stable, and (c) agree with
a from-scratch run over A ∪ B on (almost) every doc. Re-ingesting the same
batch is a ledger-protected no-op.
"""

from __future__ import annotations

import pandas as pd
import pytest

from dedup.config import DedupConfig
from dedup.corpus import generate_corpus
from dedup.pipeline import Pipeline

CFG = DedupConfig(shuffle_partitions=8)
N_TOTAL = 500
N_BASE = 350


@pytest.fixture(scope="module")
def split_corpus():
    c = generate_corpus(N_TOTAL, seed=42)
    # clone groups are emitted contiguously, so a row split leaves some
    # groups straddling the boundary — exactly the interesting case
    files_a = c.files.iloc[:N_BASE].reset_index(drop=True)
    files_b = c.files.iloc[N_BASE:].reset_index(drop=True)
    return c, files_a, files_b


@pytest.fixture(scope="module")
def incremental_clusters(spark, split_corpus, tmp_path_factory):
    _, files_a, files_b = split_corpus
    work = tmp_path_factory.mktemp("incr")
    pipe = Pipeline(spark, CFG, work)
    pipe.run(spark.createDataFrame(files_a))
    out = pipe.ingest(spark.createDataFrame(files_b)).toPandas()
    return pipe, out


@pytest.fixture(scope="module")
def batch_clusters(spark, split_corpus, tmp_path_factory):
    c, _, _ = split_corpus
    work = tmp_path_factory.mktemp("full")
    pipe = Pipeline(spark, CFG, work)
    return pipe.run(spark.createDataFrame(c.files)).toPandas()


def _partition_pairs(cl: pd.DataFrame) -> set[tuple[int, int]]:
    pairs = set()
    for _, grp in cl.groupby("cluster_id"):
        ids = sorted(grp.doc_id)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def test_all_docs_assigned(incremental_clusters):
    _, incr = incremental_clusters
    assert len(incr) == N_TOTAL
    assert incr.doc_id.is_unique
    mins = incr.groupby("cluster_id").doc_id.min()
    assert (mins.index == mins.values).all()


def test_matches_batch_recompute(incremental_clusters, batch_clusters):
    """Cluster partitions from incremental ingest vs from-scratch batch run
    must agree almost exactly (candidate sets differ slightly around the
    bucket cap, but verified components must coincide)."""
    _, incr = incremental_clusters
    p_incr = _partition_pairs(incr)
    p_batch = _partition_pairs(batch_clusters)
    inter = len(p_incr & p_batch)
    union = len(p_incr | p_batch)
    assert union > 0
    jacc = inter / union
    assert jacc >= 0.99, (
        f"partition agreement {jacc:.4f}: "
        f"only_incr={len(p_incr - p_batch)} only_batch={len(p_batch - p_incr)}"
    )


def test_reingest_is_noop(spark, split_corpus, incremental_clusters):
    _, _, files_b = split_corpus
    pipe, first = incremental_clusters
    snaps = {t: pipe.store.current_snapshot(t)
             for t in ["hashed", "reps", "signatures", "bands", "clusters"]}
    again = pipe.ingest(spark.createDataFrame(files_b)).toPandas()
    for t, s in snaps.items():
        assert pipe.store.current_snapshot(t) == s, t
    a = first.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_index_grew(incremental_clusters):
    pipe, incr = incremental_clusters
    hashed = pipe.store.read(pipe.spark, "hashed")
    assert hashed.count() == N_TOTAL
    bands = pipe.store.read(pipe.spark, "bands")
    reps = pipe.store.read(pipe.spark, "reps")
    assert bands.select("doc_id").distinct().count() == reps.count()
