"""The 5-state ledger classifier as a driver-checkable SQL query.

Synthesizes a deterministic pseudo-ledger from `events` (id = event_id,
context = event_type, started_at = ts, expiry/result derived from value/
props) and classifies it with the exact precedence of the reference's
processStatus (DeduplicationContext.scala:188-216) — in Spark via
ledger.status_column, in DuckDB via the equivalent CASE chain. This puts the
R10 truth table itself under the driver's value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ledger import status_column
from . import load_table

# one fixed classification instant (UTC) for determinism: mid-January 2024,
# inside the events table's ts range
_NOW_EPOCH = 1705305600.0  # 2024-01-15 08:00:00 UTC
_MPT_S = 86400.0           # max_processing_time: 1 day


def _pseudo_ledger(ev: DataFrame) -> DataFrame:
    """Deterministic ledger rows from events:
    - started_at = ts
    - expires_on = ts + value days for value in (0, 4]; NULL otherwise
    - result     = props when event_id % 3 == 0 else NULL
    """
    return ev.select(
        F.col("event_id").cast("string").alias("id"),
        F.col("event_type").alias("context_id"),
        F.col("ts").alias("started_at"),
        F.when(
            (F.col("value") > 0) & (F.col("value") <= 4),
            F.timestamp_seconds(
                F.unix_timestamp("ts") + F.floor(F.col("value") * 86400).cast("long")
            ),
        ).alias("expires_on"),
        F.when(F.col("event_id") % 3 == 0, F.col("props")).alias("result"),
    )


def ledger_status_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    led = _pseudo_ledger(ev)
    return led.select(
        "id",
        "context_id",
        status_column(_MPT_S, _NOW_EPOCH).alias("status"),
    )


LEDGER_STATUS_SQL = f"""
WITH led AS (
  SELECT cast(event_id AS varchar) AS id,
         event_type AS context_id,
         ts AS started_at,
         CASE WHEN value > 0 AND value <= 4
              THEN to_timestamp(cast(epoch(ts) AS bigint)
                                + cast(floor(value * 86400) AS bigint))
         END AS expires_on,
         CASE WHEN event_id % 3 = 0 THEN props END AS result
  FROM events
)
SELECT id, context_id,
       CASE
         WHEN expires_on IS NOT NULL AND epoch(expires_on) < {_NOW_EPOCH}
           THEN 'expired'
         WHEN result IS NOT NULL THEN 'completed'
         WHEN epoch(started_at) + {_MPT_S} < {_NOW_EPOCH} THEN 'timeout'
         ELSE 'running'
       END AS status
FROM led
"""


def ledger_ttl_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TTL read-time filter (DynamoDB-TTL analogue, SURVEY.md section 1.2):
    live rows = expires_on null or in the future."""
    ev = load_table(spark, sf_dir, "events")
    led = _pseudo_ledger(ev)
    now = F.lit(_NOW_EPOCH)
    return (
        led.where(
            F.col("expires_on").isNull()
            | (F.unix_timestamp("expires_on").cast("double") >= now)
        )
        .groupBy("context_id")
        .agg(F.count(F.lit(1)).alias("live_rows"))
    )


LEDGER_TTL_SQL = f"""
WITH led AS (
  SELECT event_type AS context_id,
         CASE WHEN value > 0 AND value <= 4
              THEN to_timestamp(cast(epoch(ts) AS bigint)
                                + cast(floor(value * 86400) AS bigint))
         END AS expires_on
  FROM events
)
SELECT context_id, count(*) AS live_rows
FROM led
WHERE expires_on IS NULL OR epoch(expires_on) >= {_NOW_EPOCH}
GROUP BY context_id
"""


QUERIES = {
    "ledger_status_classify": (ledger_status_classify, LEDGER_STATUS_SQL),
    "ledger_ttl_retention": (ledger_ttl_retention, LEDGER_TTL_SQL),
}
