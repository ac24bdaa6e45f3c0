"""Corpus generator sanity: determinism, class ratios, planted Jaccard bands."""

from __future__ import annotations

import random

import numpy as np

from dedup import kernels as K
from dedup.corpus import generate_corpus


def test_deterministic():
    c1 = generate_corpus(400, seed=42)
    c2 = generate_corpus(400, seed=42)
    assert c1.files.equals(c2.files)
    assert c1.truth.equals(c2.truth)


def test_shape_and_classes():
    c = generate_corpus(1000, seed=42)
    assert len(c.files) == 1000
    assert set(c.files.columns) == {"repo", "path", "commit", "lang", "content"}
    counts = c.truth.clone_type.value_counts()
    assert counts["exact"] >= 90
    assert counts["type2"] >= 90
    assert counts["type3"] >= 45
    assert counts["boilerplate"] >= 50
    assert counts["unique"] > 600
    lens = c.files.content.str.len()
    assert lens.min() >= 150 and lens.max() <= 8100


def test_exact_groups_byte_identical():
    c = generate_corpus(800, seed=42)
    merged = c.files.merge(c.truth, on=["repo", "path", "commit"])
    for _, grp in merged[merged.clone_type == "exact"].groupby("truth_cluster_id"):
        assert grp.content.nunique() == 1
        assert len(grp) >= 2
        # different natural keys
        assert len(grp[["repo", "path", "commit"]].drop_duplicates()) == len(grp)


def test_planted_jaccard_bands():
    c = generate_corpus(800, seed=42)
    merged = c.files.merge(c.truth, on=["repo", "path", "commit"])
    rng = random.Random(0)

    def sample_pair_j(ctype, n=8):
        out = []
        grps = [g for _, g in merged[merged.clone_type == ctype].groupby("truth_cluster_id")
                if len(g) >= 2]
        for g in rng.sample(grps, min(n, len(grps))):
            a, b = g.content.iloc[0], g.content.iloc[1]
            out.append(K.jaccard_shingles(a, b, 9))
        return out

    for j in sample_pair_j("type2"):
        assert j >= 0.70, f"type2 pair too distant: {j}"
    for j in sample_pair_j("type3"):
        assert j >= 0.45, f"type3 pair too distant: {j}"
    # unique docs must be far apart (precision guard)
    uniq = merged[merged.clone_type == "unique"].content.sample(30, random_state=1).tolist()
    for i in range(0, 28, 2):
        assert K.jaccard_shingles(uniq[i], uniq[i + 1], 9) < 0.4


def test_truth_pairs():
    c = generate_corpus(300, seed=42)
    pairs = c.truth_pairs
    assert len(pairs) > 50
    # all pairs ordered + unique
    for a, b in list(pairs)[:20]:
        assert a < b
