"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as `binary`
columns with struct metadata; decode/resize/feature-extract run as
Arrow-batched `mapInPandas` transforms so bytes never round-trip through
Python row objects. The image/audio codecs are NOT in this container, so the
decode kernel is stubbed (NotImplementedError) behind a deterministic fake
used by tests — the Spark-side plumbing (schema, batch iteration, partition
control, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int>"
)

_FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from `documents` (payload =
    utf-8 bytes of the text; metadata derived from doc stats). Stands in for
    an Iceberg media table until real ingestion exists."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    """Real decoder hook — requires PIL/ffmpeg, absent in this container."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "environment; use fake=True (deterministic hash features)"
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: sha256-seeded feature vector.

    float64 on purpose: each feature is (uint32 % 10000)/10000.0, exactly
    representable the same way in the DuckDB oracle, so the whole feature
    matrix is value-hash comparable across engines."""
    h = hashlib.sha256(kind.encode() + payload).digest()
    raw = np.frombuffer(h * (_FEATURE_DIM * 4 // len(h) + 1), dtype=np.uint32)
    return (raw[:_FEATURE_DIM] % 10_000).astype(np.float64) / 10_000.0


def extract_features(
    media: DataFrame, fake: bool = True, batch_partitions: int | None = None
) -> DataFrame:
    """(media_id, kind, feature: array<float>, payload_bytes: long) via
    mapInPandas — one Arrow batch of payloads at a time, no per-row Python
    inside Spark (the batch loop is numpy/hashlib per element, the Spark
    boundary is batch-wise)."""
    decode = _decode_fake if fake else _decode_real

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "payload_bytes": pdf["payload"].map(len),
                }
            )

    df = media
    if batch_partitions:
        # bound per-task payload memory before the Python exchange
        df = df.repartition(batch_partitions)
    return df.mapInPandas(
        _extract,
        "media_id long, kind string, feature array<double>, payload_bytes long",
    )


def media_dedup_by_payload(media: DataFrame) -> DataFrame:
    """Exact dedup of media by payload hash — sha2 works on binary directly,
    so identical payloads cluster without decoding."""
    hashed = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("sha")
    )
    owners = hashed.groupBy("sha").agg(F.min("media_id").alias("cluster_id"))
    return hashed.join(owners, "sha").select(
        "media_id", "cluster_id",
        (F.col("media_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def _media_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing projection of extract_features: the `feature`
    array<double> column is EXPLODED to (media_id, kind, j, feature_j,
    payload_bytes) rows — the driver's pandas canonicalizer cannot
    sort/hash array-typed cells (CORRECTNESS_r02: unhashable ndarray), and
    a long/double row shape is also the layout a downstream feature table
    would use. j is long on both engines (DuckDB range() yields BIGINT)."""
    feats = extract_features(synthesize_media(spark, sf_dir), fake=True)
    return feats.select(
        "media_id", "kind",
        F.posexplode("feature").alias("j", "feature_j"),
        "payload_bytes",
    ).withColumn("j", F.col("j").cast("long"))


def _media_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_dedup_by_payload(synthesize_media(spark, sf_dir))


# DuckDB's sha256 takes VARCHAR (utf-8 bytes of the string) — identical bytes
# to Spark's sha2(encode(text, 'utf-8'), 256) for utf-8 text payloads.
MEDIA_DEDUP_SQL = """
SELECT doc_id AS media_id,
       min(doc_id) OVER (PARTITION BY sha256(text)) AS cluster_id,
       doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_canonical
FROM documents
"""


# --- full SQL mirror of the fake decoder -----------------------------------
# feature[j] = (u32_le(digest bytes 4*(j%8) .. +4) % 10000) / 10000.0 where
# digest = sha256(kind || text). DuckDB's sha256 returns lowercase hex; each
# byte is reconstructed from its two hex chars via strpos arithmetic.

def _hex_byte_sql(o: int) -> str:
    """Integer value of digest byte `o` (0-based) from the hex string hx."""
    hi, lo = 2 * o + 1, 2 * o + 2
    return (
        f"((strpos('0123456789abcdef', substr(hx, {hi}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(hx, {lo}, 1)) - 1))"
    )


def _u32le_sql(o: int) -> str:
    return "(" + " + ".join(
        f"{_hex_byte_sql(o + k)} * {1 << (8 * k)}" for k in range(4)
    ) + ")"


_FEATURE_LIST_SQL = "[" + ", ".join(
    # the 32-byte digest holds 8 uint32s; the python side tiles it, so
    # feature j reads u32 index j % 8
    f"(({_u32le_sql(4 * (j % 8))}) % 10000) / 10000.0"
    for j in range(_FEATURE_DIM)
) + "]"

MEDIA_FEATURES_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text
  FROM documents
),
hashed AS (
  SELECT media_id, kind, text, sha256(kind || text) AS hx FROM m
),
feat AS (
  SELECT media_id, kind,
         {_FEATURE_LIST_SQL} AS feature,
         strlen(text) AS payload_bytes
  FROM hashed
)
SELECT media_id, kind, j, feature[j::INT + 1] AS feature_j, payload_bytes
FROM feat CROSS JOIN (SELECT unnest(range(0, {_FEATURE_DIM})) AS j)
"""

QUERIES = {
    "media_extract_features": (_media_features_query, MEDIA_FEATURES_SQL),
    "media_dedup_by_payload": (_media_dedup_query, MEDIA_DEDUP_SQL),
}
