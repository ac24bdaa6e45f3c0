"""Ops-layer quality checks beyond the oracle equality gate."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


def test_ann_lsh_recall_vs_bruteforce(spark, tmp_path):
    """The bucketed ANN must recover most exact top-5 neighbors on data with
    actual cluster structure. (The driver `embeddings` table is isotropic
    noise — top-5 sims ~0.32 — on which any sublinear LSH is blind by
    construction, so the recall assertion uses planted clusters instead;
    the noise table is still exercised by the oracle-gate tests.)"""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((40, 64))
    rows = []
    vid = 0
    for label, c in enumerate(centers):
        for _ in range(10):
            v = c + 0.15 * rng.standard_normal(64)
            rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32), label))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    pdf["embedding"] = pdf.embedding.map(list)
    d = tmp_path / "ann"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet", index=False)

    from dedup.ops.similarity import embedding_ann_lsh, embedding_topk_cosine

    exact = {
        (r["q_id"], r["vec_id"])
        for r in embedding_topk_cosine(spark, str(d)).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in embedding_ann_lsh(spark, str(d)).collect()
    }
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"ANN recall too low: {recall:.3f}"


def test_embedding_neardup_clusters_planted(spark, tmp_path):
    """Planted near-identical vector pairs must cluster; distant vectors
    must stay singletons."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    truth_pairs = []
    for _ in range(30):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        near = v + 0.02 * rng.standard_normal(64)
        near /= np.linalg.norm(near)
        rows.append((vid, v.astype(np.float32).tolist(), 0))
        rows.append((vid + 1, near.astype(np.float32).tolist(), 0))
        truth_pairs.append((vid, vid + 1))
        vid += 2
    for _ in range(60):  # unrelated singletons
        v = rng.standard_normal(64)
        rows.append((vid, (v / np.linalg.norm(v)).astype(np.float32).tolist(), 1))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = tmp_path / "nd"
    d.mkdir()
    pdf.to_parquet(d / "embeddings.parquet", index=False)

    from dedup.ops.similarity import embedding_neardup_clusters

    out = embedding_neardup_clusters(spark, str(d)).toPandas()
    cl = dict(zip(out.vec_id, out.cluster_id))
    clustered = sum(cl[a] == cl[b] for a, b in truth_pairs)
    assert clustered >= 0.8 * len(truth_pairs), f"{clustered}/{len(truth_pairs)}"
    # singletons stay alone
    singles = out[out.vec_id >= 60]
    assert (singles.vec_id == singles.cluster_id).mean() > 0.95


def test_revenue_by_nation_broadcasts_dims(spark):
    """The small dims must be broadcast, not shuffled (SURVEY.md section 2.2)."""
    from dedup.ops.relational import revenue_by_nation

    plan = revenue_by_nation(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q1_filter_pushed_down(spark):
    """The shipdate filter must reach the parquet scan."""
    from dedup.ops.relational import q1_pricing_summary

    plan = q1_pricing_summary(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_ann_probe_join_bounded_by_bucket_cap(spark):
    """A planted mega-bucket (every vector in the same sign bucket) cannot
    make the probe join emit more than cap index rows per (query, probe):
    the index side is row_number-capped per bucket (VERDICT r2 #5)."""
    import numpy as np
    from pyspark.sql import functions as F

    from dedup.ops.similarity import _PLANES, _ann_topk

    # all vectors = the same direction (+ tiny id-scaled noise along it):
    # one bucket holds the whole corpus
    base_dir = np.ones(64) / 8.0
    rows = [
        (i, (base_dir * (1.0 + i * 1e-6)).astype("float32").tolist())
        for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cap = 16
    out = _ann_topk(emb, probe_cap=cap).collect()
    # results exist and every candidate the join produced is from the capped
    # prefix: with ORDER BY vec_id, only vec_ids < cap survive the index side
    assert len(out) > 0
    assert all(r["vec_id"] < cap for r in out)


def test_ann_n_planes_sizing():
    from dedup.ops.similarity import _N_PLANES, ann_n_planes

    assert ann_n_planes(10_000) == max(_N_PLANES, 4)
    assert ann_n_planes(10**12, target_bucket=1024) == 30
    assert ann_n_planes(100) == _N_PLANES  # small corpora keep the default
