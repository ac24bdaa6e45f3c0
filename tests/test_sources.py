"""Corpus source contract: parquet / JSONL / CSV read through one declared
schema, invalid rows filtered at the boundary, and every format feeds the
pipeline identically (format is a physical detail, never a semantic one)."""

from __future__ import annotations

import json

import pandas as pd
import pytest

from dedup.config import DedupConfig
from dedup.corpus import generate_corpus
from dedup.sources import (
    CODE_FILES_COLUMNS,
    load_corpus,
    read_code_files,
    valid_code_files,
)

CFG = DedupConfig(shuffle_partitions=8)


@pytest.fixture(scope="module")
def small_files() -> pd.DataFrame:
    return generate_corpus(120, seed=3).files


def _write_jsonl(pdf: pd.DataFrame, path) -> str:
    with open(path, "w") as f:
        for rec in pdf.to_dict("records"):
            f.write(json.dumps(rec) + "\n")
    return str(path)


def test_three_formats_read_identically(spark, tmp_path, small_files):
    pq = tmp_path / "c.parquet"
    small_files.to_parquet(pq, index=False)
    jl = _write_jsonl(small_files, tmp_path / "c.jsonl")
    cs = tmp_path / "c.csv"
    small_files.to_csv(cs, index=False)

    frames = {
        fmt: read_code_files(spark, p).toPandas()
        for fmt, p in (("parquet", str(pq)), ("jsonl", jl), ("csv", str(cs)))
    }
    for fmt, pdf in frames.items():
        assert list(pdf.columns) == CODE_FILES_COLUMNS, fmt
        assert (pdf.dtypes == object).all(), fmt
    base = frames["parquet"].sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    for fmt in ("jsonl", "csv"):
        got = frames[fmt].sort_values(["repo", "path", "commit"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(base, got, check_dtype=False)


def test_invalid_rows_filtered_and_counted(spark, tmp_path, small_files):
    bad = small_files.copy()
    bad.loc[0, "content"] = None
    bad.loc[1, "repo"] = None
    bad.loc[2, "lang"] = None  # lang may be NULL — must survive
    path = _write_jsonl(bad, tmp_path / "bad.jsonl")
    valid, n_rejected = load_corpus(spark, path)
    assert n_rejected == 2
    assert valid.count() == len(small_files) - 2
    assert valid.where("lang IS NULL").count() == 1


def test_jsonl_missing_field_becomes_rejected_row(spark, tmp_path):
    path = tmp_path / "m.jsonl"
    with open(path, "w") as f:
        f.write(json.dumps({"repo": "r", "path": "p", "commit": "c",
                            "lang": "py", "content": "x = 1"}) + "\n")
        f.write(json.dumps({"repo": "r", "path": "p2", "commit": "c"}) + "\n")
    valid, n_rejected = load_corpus(spark, str(path))
    assert valid.count() == 1 and n_rejected == 1


def test_parquet_missing_column_fails_fast(spark, tmp_path, small_files):
    pq = tmp_path / "m.parquet"
    small_files.drop(columns=["commit"]).to_parquet(pq, index=False)
    with pytest.raises(ValueError, match="missing columns.*commit"):
        read_code_files(spark, str(pq))


def test_extra_columns_dropped(spark, tmp_path, small_files):
    pq = tmp_path / "x.parquet"
    extra = small_files.assign(stars=7)
    extra.to_parquet(pq, index=False)
    df = read_code_files(spark, str(pq))
    assert df.columns == CODE_FILES_COLUMNS


def test_jsonl_corpus_clusters_identically_to_parquet(spark, tmp_path):
    """End-to-end: the SAME corpus via JSONL and parquet produces identical
    cluster assignments — the source layer is semantics-free."""
    from dedup.pipeline import run_dataframe_pipeline

    pdf = generate_corpus(200, seed=9).files
    pq = tmp_path / "c.parquet"
    pdf.to_parquet(pq, index=False)
    jl = _write_jsonl(pdf, tmp_path / "c.jsonl")
    out_pq = run_dataframe_pipeline(
        valid_code_files(read_code_files(spark, str(pq))), CFG
    ).toPandas()
    out_jl = run_dataframe_pipeline(
        valid_code_files(read_code_files(spark, jl)), CFG
    ).toPandas()
    a = out_pq.sort_values("doc_id").reset_index(drop=True)
    b = out_jl.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_json_array_file_fails_fast(spark, tmp_path):
    """ADVICE r3: a .json file holding one JSON ARRAY parses to all-null
    rows under the JSONL reader; load_corpus must raise instead of
    reporting a silently empty corpus."""
    import json

    import pytest

    from dedup.sources import load_corpus

    p = tmp_path / "corpus.json"
    p.write_text(json.dumps([
        {"repo": "r", "path": "p", "commit": "c", "lang": "py",
         "content": "x = 1"},
    ], indent=2))  # pretty-printed array: every LINE fails to parse
    with pytest.raises(ValueError, match="JSON-array"):
        load_corpus(spark, str(p))
