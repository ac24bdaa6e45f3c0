"""Incremental span ingest: union equivalence vs the one-shot query,
old-doc flip semantics, ledger replay, O(batch + touched) delta bounds,
partitioned index layout, multi-batch folding.

The equivalence oracle is ops.spans.doc_dup_span_stats itself: (L, p) are
frozen in span_meta and the sampling is content-defined, so an ingest
sequence must reproduce the one-shot stats over the union corpus exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup.config import DedupConfig
from dedup.incremental_spans import (
    N_PBUCKETS_SPANS,
    build_span_index,
    ingest_spans,
    read_span_stats,
)
from dedup.ledger import Ledger
from dedup.ops.spans import doc_dup_span_stats
from dedup.storage import TableStore

CFG = DedupConfig(shuffle_partitions=8)


def _blk(tag: str) -> str:
    """A ~200-char block with NO long run shared across tags (every word
    derives from the tag's own random stream)."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    return " ".join(
        f"{tag}{w:07d}" for w in rng.integers(0, 10**7, size=24)
    )


def _unique(i: int, n: int = 400) -> str:
    rng = np.random.default_rng(2000 + i)
    return " ".join(
        f"u{w:09d}"[:8] for w in rng.integers(0, 10**9, size=n // 8)
    )


X, Y, Z, W = _blk("xx"), _blk("yy"), _blk("zz"), _blk("ww")

BASE = [
    (1, _unique(1) + " " + X),   # X: dup inside base (3 holders)
    (2, X + " " + _unique(2)),
    (3, _unique(3) + " " + Y),   # Y: single holder -> flip target
    (4, _unique(4)),             # clean forever
    (5, _unique(5) + " " + X),
]
BATCH1 = [
    (11, Y + " " + _unique(6)),   # flips doc 3
    (12, _unique(7) + " " + Z),   # Z: batch-internal dup pair
    (13, Z + " " + _unique(8)),
    (14, _unique(9) + " " + W),   # W single holder after batch 1
    (15, _unique(10) + " " + X),  # joins the already-dup X family
]
BATCH2 = [
    (21, W + " " + _unique(11)),  # flips doc 14 (ingested in batch 1)
    (22, _unique(12)),            # clean
]


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _union_dir(tmp, rows):
    d = tmp / f"union_{len(rows)}"
    d.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows],
         "lang": ["en"] * len(rows), "source": ["t"] * len(rows),
         "n_chars": [len(r[1]) for r in rows]}
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    return (pdf[["doc_id", "n_spans", "n_dup_spans", "dup_ratio"]]
            .sort_values("doc_id").reset_index(drop=True))


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("span_incr")
    store = TableStore(work / "tables")
    ledger = Ledger(work / "ledger")
    build_span_index(spark, CFG, store, _docs_df(spark, BASE))
    base_stats = _canon(read_span_stats(spark, store).toPandas())
    stats1 = ingest_spans(
        spark, CFG, store, ledger, _docs_df(spark, BATCH1)
    )
    return work, store, ledger, base_stats, _canon(stats1.toPandas())


def test_build_matches_oneshot(spark, tmp_path, ingested):
    _, _, _, base_stats, _ = ingested
    oneshot = _canon(
        doc_dup_span_stats(spark, _union_dir(tmp_path, BASE)).toPandas()
    )
    pd.testing.assert_frame_equal(base_stats, oneshot)
    # fixture sanity: X is already duplicated in base, Y's holder is clean
    s = base_stats.set_index("doc_id")
    assert s.loc[1, "n_dup_spans"] > 0
    assert s.loc[3, "n_dup_spans"] == 0
    assert s.loc[4, "n_dup_spans"] == 0


def test_ingest_equals_oneshot_union(spark, tmp_path, ingested):
    _, _, _, _, stats1 = ingested
    oneshot = _canon(
        doc_dup_span_stats(
            spark, _union_dir(tmp_path, BASE + BATCH1)
        ).toPandas()
    )
    pd.testing.assert_frame_equal(stats1, oneshot)
    s = stats1.set_index("doc_id")
    assert s.loc[3, "n_dup_spans"] > 0       # flipped by batch doc 11
    assert s.loc[12, "n_dup_spans"] > 0      # batch-internal pair
    assert s.loc[13, "n_dup_spans"] > 0
    assert s.loc[15, "n_dup_spans"] > 0      # batch-vs-old dup
    assert s.loc[4, "n_dup_spans"] == 0      # still clean
    assert s.loc[14, "n_dup_spans"] == 0     # W has one holder so far


def test_delta_is_batch_plus_flipped_only(spark, ingested):
    _, store, _, _, _ = ingested
    paths = store.paths("span_stats")
    assert len(paths) >= 2, "ingest must APPEND a delta, not rewrite"
    delta = pd.read_parquet(paths[-1])
    # exactly the 5 batch docs + the single flipped old doc (doc 3)
    assert sorted(delta.doc_id) == [3, 11, 12, 13, 14, 15]


def test_reingest_is_ledger_replay(spark, ingested):
    _, store, ledger, _, stats1 = ingested
    before = len(store.paths("span_stats"))
    replay = ingest_spans(
        spark, CFG, store, ledger, _docs_df(spark, BATCH1)
    )
    assert len(store.paths("span_stats")) == before
    pd.testing.assert_frame_equal(_canon(replay.toPandas()), stats1)


def test_index_is_pbucket_partitioned(spark, ingested):
    _, store, _, _, _ = ingested
    assert store.partition_cols("span_index") == ["pbucket"]
    idx = pd.read_parquet(store.paths("span_index")[0])
    assert set(idx.columns) >= {"h", "doc_id", "cnt"}
    probe = store.read(spark, "span_index")
    assert probe.where(
        F.col("pbucket") >= N_PBUCKETS_SPANS
    ).count() == 0


def test_second_batch_flips_a_batch1_doc(spark, tmp_path, ingested):
    work, store, ledger, _, _ = ingested
    stats2 = _canon(
        ingest_spans(
            spark, CFG, store, ledger, _docs_df(spark, BATCH2)
        ).toPandas()
    )
    oneshot = _canon(
        doc_dup_span_stats(
            spark, _union_dir(tmp_path, BASE + BATCH1 + BATCH2)
        ).toPandas()
    )
    pd.testing.assert_frame_equal(stats2, oneshot)
    s = stats2.set_index("doc_id")
    assert s.loc[14, "n_dup_spans"] > 0      # flipped by batch-2 doc 21
    assert s.loc[22, "n_dup_spans"] == 0


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_randomized_union_equivalence(spark, tmp_path, seed):
    """Small-vocabulary random corpora create organically rich duplication
    (3+ holders per hash, within-doc repeats, hashes flipping across both
    batches) that the planted fixture can't enumerate; build + two ingests
    must still equal the one-shot query on the union, exactly."""
    rng = np.random.default_rng(seed)
    # a pool of 15 distinct ~150-char phrases; each doc concatenates 2-5
    # pool phrases (with replacement -> within-doc repeats) separated by
    # doc-unique words -> multi-holder hashes, repeats, cross-batch flips
    pool = [
        " ".join(f"p{k:02d}w{w:06d}" for w in
                 np.random.default_rng(10_000 * seed + k)
                 .integers(0, 10**6, size=16))
        for k in range(15)
    ]
    rows = []
    for i in range(30):
        picks = rng.integers(0, len(pool), size=int(rng.integers(2, 6)))
        segs = []
        for j, k in enumerate(picks):
            segs.append(pool[k])
            segs.append(f"uniq{i:03d}x{j}")
        rows.append((i, " ".join(segs)))
    base, b1, b2 = rows[:14], rows[14:23], rows[23:]

    work = tmp_path / f"rand{seed}"
    store = TableStore(work / "tables")
    ledger = Ledger(work / "ledger")
    build_span_index(spark, CFG, store, _docs_df(spark, base))
    ingest_spans(spark, CFG, store, ledger, _docs_df(spark, b1))
    got = _canon(
        ingest_spans(
            spark, CFG, store, ledger, _docs_df(spark, b2)
        ).toPandas()
    )
    oneshot = _canon(
        doc_dup_span_stats(spark, _union_dir(tmp_path / f"u{seed}", rows))
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, oneshot)
    # the case is only convincing if duplication is actually rich
    assert (got.n_dup_spans > 0).sum() >= 5
