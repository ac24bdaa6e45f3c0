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


def protect_stream_stateful(
    events: DataFrame,
    id_col: str = "event_id",
    context_col: str = "event_type",
    ts_col: str = "ts",
    completion_col: str = "is_completion",
    max_processing_time_s: float = 3600.0,
    result_col: str | None = None,
    ttl_s: float | None = None,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Full keyed-idempotency state machine as a stateful streaming operator.

    The complete graft of the reference's protect lifecycle
    (DeduplicationContext.scala:113-216) onto applyInPandasWithState: per
    (id, context) key the state is (started_at, completed, result) and each
    arriving attempt is classified with the reference's precedence:

      no state                         -> 'new'        (claim + run)
      state.completed                  -> 'duplicate'  (stored result replay)
      ts - started_at > maxProcessing  -> 'takeover'   (stale claim, re-run)
      otherwise                        -> 'running'    (a peer holds the claim)

    Events with `completion_col` true mark the key completed ('completed'
    decision) — the markAsCompleted phase-2 commit (MeteorProcessRepo.scala:46-73).
    If `result_col` names a column, a completion's payload is persisted in
    state and REPLAYED to every later duplicate arrival — protect(id, fa)
    returns the first winner's stored value to all callers, not just a
    'duplicate' label (DeduplicationContext.scala:163-167).

    `ttl_s` is the graft of the reference's TTL expiry (DynamoDB table TTL,
    example.tf:32-35; re-run-after-expiry test DeduplicationSuite.scala:183-200)
    and bounds the state store, which otherwise grows one entry per key
    forever. Two mechanisms realize it:
      - arrival-time expiry: an event arriving at epoch > expires_at
        (last claim/completion + ttl_s) sees the key as ABSENT — decision
        'new', effect re-runs — exactly the batch ledger's EXPIRED status;
      - event-time state DROP: the state carries expires_at and registers
        it as an EventTimeTimeout; once the watermark passes it with no new
        arrival, the state row is physically removed, so the store holds
        only live keys. Requires a watermark on `ts_col` (the `watermark`
        delay is applied here when ttl_s is set).

    State-schema compatibility (ADVICE r4): the per-key state layout depends
    on the features enabled — (started_at, completed, result) by default,
    + expires_at when ttl_s is set. Changing ttl_s (or, historically,
    result_col) across a restart fails Spark's state-schema check against
    an existing checkpoint: enabling/disabling TTL requires a FRESH
    checkpoint location.

    Output: (id, context, ts, decision, result) — result is the stored
    payload on 'completed'/'duplicate' rows, null otherwise.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    has_ttl = ttl_s is not None

    def classify(key, pdfs, state: "GroupState"):
        import pandas as pd  # noqa: PLC0415 — executor-side import

        out_cols = ["id", "context", "ts", "decision", "result"]
        if state.hasTimedOut:
            # watermark passed expires_at with no new arrival: the key's
            # retention window is over — drop the row (DynamoDB TTL sweep)
            state.remove()
            yield pd.DataFrame(columns=out_cols)
            return
        expires_at = None
        if state.exists:
            if has_ttl:
                started_at, completed, result, expires_at = state.get
            else:
                started_at, completed, result = state.get
        else:
            started_at, completed, result = None, False, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            # the state machine is inherently sequential per key (takeovers
            # reset started_at, affecting later gaps), but the loop runs on
            # plain numpy scalars — no per-row pandas Series construction
            ts_vals = pdf[ts_col].to_numpy()
            epochs = pdf[ts_col].astype("int64").to_numpy() / 1e9
            comp_vals = pdf[completion_col].to_numpy()
            res_vals = pdf["result"].to_numpy(dtype=object)
            for i in range(len(pdf)):
                epoch = float(epochs[i])
                emitted = None
                if has_ttl and expires_at is not None and epoch > expires_at:
                    # expired key looks ABSENT: re-claim + re-run
                    # (ledger.Status.EXPIRED precedence, ledger.py:58-104)
                    started_at, completed, result = None, False, None
                    expires_at = None
                if comp_vals[i]:
                    completed = True
                    if started_at is None:
                        started_at = epoch
                    # first completion wins; later completions replay it
                    # (the reference's conditional write keeps the stored row)
                    if result is None:
                        result = res_vals[i]
                    emitted = result
                    decision = "completed"
                elif started_at is None:
                    started_at = epoch
                    decision = "new"
                elif completed:
                    emitted = result  # stored-result replay
                    decision = "duplicate"
                elif epoch - started_at > max_processing_time_s:
                    started_at = epoch  # CAS takeover resets the claim
                    decision = "takeover"
                else:
                    decision = "running"
                if has_ttl and decision in ("new", "takeover", "completed"):
                    # only state-WRITING events refresh the retention window
                    # (running/duplicate don't rewrite the reference's row)
                    expires_at = epoch + ttl_s
                out.append((key[0], key[1], ts_vals[i], decision, emitted))
        if has_ttl:
            state.update((started_at, completed, result, expires_at))
            if expires_at is not None:
                # must exceed the current watermark or Spark rejects it;
                # an already-past expiry fires at the next micro-batch
                state.setTimeoutTimestamp(
                    max(int(expires_at * 1000),
                        state.getCurrentWatermarkMs() + 1)
                )
        else:
            state.update((started_at, completed, result))
        yield pd.DataFrame(out, columns=out_cols)

    result_expr = (
        F.col(result_col).cast("string") if result_col is not None
        else F.lit(None).cast("string")
    )
    keyed = events.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(context_col).alias("context"),
        F.col(ts_col).alias(ts_col),
        F.col(completion_col).cast("boolean").alias(completion_col),
        result_expr.alias("result"),
    )
    state_schema = "started_at double, completed boolean, result string"
    if has_ttl:
        keyed = keyed.withWatermark(ts_col, watermark)
        state_schema += ", expires_at double"
    return (
        keyed.groupBy("id", "context")
        .applyInPandasWithState(
            classify,
            outputStructType=(
                "id long, context string, ts timestamp, decision string,"
                " result string"
            ),
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.EventTimeTimeout if has_ttl
                else GroupStateTimeout.NoTimeout
            ),
        )
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
