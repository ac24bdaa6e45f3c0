"""Structured Streaming analogues of the reference's online protect semantics.

The reference is an *online* dedup store: protect(id, fa) runs an effect once
per (id, contextId) and replays the stored result to concurrent/later callers
(reference DeduplicationContext.scala:29,95-111), with TTL expiry re-opening
keys (:194-202). The batch pipeline is the primary deliverable (SURVEY.md
section 2.2 streaming row), and these operators document + implement the
streaming mapping:

- `protect_stream`      = dropDuplicatesWithinWatermark([id, context]) —
  keep the FIRST event per key within the watermark horizon; the watermark
  plays the role of the TTL (state for expired keys is dropped, so a very
  late duplicate re-runs: exactly the reference's at-least-once-with-dedup
  guarantee, README.md:211-219).
- `duplicate_counts_stream` = windowed count of suppressed duplicates — the
  streaming form of the onDuplicateDetected callback metrics (R4).

Both are plain readStream->transform->writeStream graphs; tests drive them
with a file source and a memory sink via processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def protect_stream(
    events: DataFrame,
    id_col: str = "event_id",
    context_col: str = "event_type",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-event-per-(id, context) within the watermark horizon.

    The composite key mirrors the reference's (id, contextId) partition/sort
    key pair (example.tf:9-10); `withWatermark` bounds the dedup state like
    DynamoDB TTL bounds the table.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([id_col, context_col])
    )


def duplicate_counts_stream(
    events: DataFrame,
    id_col: str = "event_id",
    context_col: str = "event_type",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Per-window duplicate-arrival counts: n_events - n_distinct_keys.

    Streaming graft of the duplicate callback counting test
    (reference DeduplicationSuite.scala:138-153: N callers -> N-1 callbacks).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(context_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct(id_col).alias("n_keys"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            context_col,
            "n_events",
            "n_keys",
            (F.col("n_events") - F.col("n_keys")).alias("n_duplicates_approx"),
        )
    )
