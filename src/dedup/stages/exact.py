"""Stage 1 — sha256 exact dedup (the per-row invariant stage).

The reference's whole value proposition is "same stable id => one execution,
result replayed" (reference README.md:14-16, DeduplicationContext.scala:95-111).
The batch generalization: same content => same sha256 => same exact cluster,
canonical member elected deterministically as min(doc_id), result (the cluster
assignment) replayed to every member — first-writer-wins made deterministic
(SURVEY.md section 2.3 invariant 3).

Scale notes (100 TB): the groupBy(sha) aggregation does a map-side partial
min, so the shuffle carries one (sha, min_doc_id) pair per DISTINCT content,
not per row. `content` is pruned from every downstream DataFrame the moment
the hash exists — only representatives keep it for shingling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_content(files: DataFrame) -> DataFrame:
    """Add doc_id (xxhash64 of the natural key) and the sha256 content hash.

    doc_id = xxhash64(repo, path, commit) per FIXTURES.md section 1; sha256 is the
    per-row invariant vs the reference (BASELINE.json input_hint): it must
    equal hashlib.sha256(content.encode()).hexdigest() — Spark's sha2 operates
    on the UTF-8 bytes, which the invariant test pins.
    """
    return files.withColumn("doc_id", F.xxhash64("repo", "path", "commit")).withColumn(
        "sha", F.sha2(F.col("content"), 256)
    )


def exact_clusters(hashed: DataFrame) -> DataFrame:
    """Per-doc exact cluster assignment.

    cluster_id = min(doc_id) over identical sha; is_canonical marks the
    elected representative (the 'New' row; all others are 'Duplicate' —
    reference model.scala:28-37 mapped to columns, SURVEY.md R5).
    """
    owners = hashed.groupBy("sha").agg(F.min("doc_id").alias("cluster_id"))
    return (
        hashed.select("doc_id", "sha")
        .join(owners, "sha")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
            F.lit("exact").alias("method"),
        )
    )


def representatives(hashed: DataFrame) -> DataFrame:
    """One full row per distinct content (the exact-cluster canonical).

    Downstream near-dup stages run on representatives only: at 10^12-file
    scale with ~10% exact duplicates this cuts shingling/signature work
    proportionally, and near-dup similarity is a function of content alone,
    so member docs inherit their representative's near-dup edges.
    """
    owners = hashed.groupBy("sha").agg(F.min("doc_id").alias("doc_id"))
    return hashed.join(owners.select("doc_id"), "doc_id", "left_semi")
