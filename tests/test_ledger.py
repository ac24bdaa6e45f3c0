"""Ledger: the 5-state classifier truth table + repo contract.

Direct graft of the reference's test layers:
- ProcessStatusSuite.scala:13-159 (7 classifier properties)
- MeteorProcessRepoSuite.scala:21-178 (repo contract: context segregation,
  create-inserts / create-returns-existing / create-never-mutates,
  markAsCompleted expiry math, attemptReplacing CAS)
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from dedup.ledger import Ledger, Process, Status, process_status, status_column

MPT = 300.0  # max_processing_time_s
NOW = 1_700_000_000.0


# ---------------------------------------------------------------------------
# classifier truth table (ProcessStatusSuite graft)
# ---------------------------------------------------------------------------

def test_missing_row_not_started():  # :13-24
    assert process_status(None, MPT, NOW) is Status.NOT_STARTED


def test_result_no_expiry_completed():  # :26-43
    p = Process("k", "c", started_at=NOW - 10, expires_on=None, result="{}")
    assert process_status(p, MPT, NOW) is Status.COMPLETED


def test_result_future_expiry_completed():  # :45-62
    p = Process("k", "c", started_at=NOW - 10, expires_on=NOW + 100, result="{}")
    assert process_status(p, MPT, NOW) is Status.COMPLETED


def test_past_expiry_expired_even_with_result():  # :64-79
    p = Process("k", "c", started_at=NOW - 10, expires_on=NOW - 1, result="{}")
    assert process_status(p, MPT, NOW) is Status.EXPIRED


def test_stale_claim_timeout():  # :81-99
    p = Process("k", "c", started_at=NOW - MPT - 1, expires_on=None, result=None)
    assert process_status(p, MPT, NOW) is Status.TIMEOUT


def test_stale_claim_timeout_even_with_future_expiry():  # :101-119
    p = Process("k", "c", started_at=NOW - MPT - 1, expires_on=NOW + 9999, result=None)
    assert process_status(p, MPT, NOW) is Status.TIMEOUT


def test_fresh_claim_running():  # :121-159
    p = Process("k", "c", started_at=NOW - 1, expires_on=None, result=None)
    assert process_status(p, MPT, NOW) is Status.RUNNING


# property sweep mirroring Generators.scala:19-35 (±90d windows)
@given(
    started_delta=st.floats(min_value=-90 * 86400, max_value=90 * 86400),
    expires_delta=st.one_of(st.none(), st.floats(min_value=-90 * 86400, max_value=90 * 86400)),
    has_result=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_classifier_precedence_property(started_delta, expires_delta, has_result):
    p = Process(
        "k", "c",
        started_at=NOW + started_delta,
        expires_on=None if expires_delta is None else NOW + expires_delta,
        result="{}" if has_result else None,
    )
    got = process_status(p, MPT, NOW)
    if p.expires_on is not None and p.expires_on < NOW:
        assert got is Status.EXPIRED
    elif has_result:
        assert got is Status.COMPLETED
    elif p.started_at + MPT < NOW:
        assert got is Status.TIMEOUT
    else:
        assert got is Status.RUNNING


# ---------------------------------------------------------------------------
# Spark column classifier == pure classifier
# ---------------------------------------------------------------------------

def test_status_column_matches_pure(spark):
    cases = [
        Process("a", "c", NOW - 10, None, "{}"),          # completed
        Process("b", "c", NOW - 10, NOW + 100, "{}"),     # completed
        Process("c", "c", NOW - 10, NOW - 1, "{}"),       # expired
        Process("d", "c", NOW - MPT - 1, None, None),     # timeout
        Process("e", "c", NOW - MPT - 1, NOW + 999, None),# timeout
        Process("f", "c", NOW - 1, None, None),           # running
        Process("g", "c", NOW - 1, NOW - 5, None),        # expired
    ]
    rows = [
        (
            p.id,
            p.context_id,
            dt.datetime.fromtimestamp(p.started_at, dt.timezone.utc),
            dt.datetime.fromtimestamp(p.expires_on, dt.timezone.utc)
            if p.expires_on is not None else None,
            p.result,
        )
        for p in cases
    ]
    df = spark.createDataFrame(
        rows, "id string, context_id string, started_at timestamp, "
              "expires_on timestamp, result string"
    )
    got = {
        r["id"]: r["status"]
        for r in df.withColumn("status", status_column(MPT, NOW)).collect()
    }
    for p in cases:
        assert got[p.id] == process_status(p, MPT, NOW).value, p.id


# ---------------------------------------------------------------------------
# repo contract (MeteorProcessRepoSuite graft)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ledger(tmp_path):
    return Ledger(tmp_path / "ledger")


def test_context_segregation(ledger):  # :21-43
    assert ledger.create("id1", "ctx1", NOW) is None
    assert ledger.create("id1", "ctx2", NOW) is None  # same id, other context: new
    assert ledger.get("id1", "ctx1").context_id == "ctx1"
    assert ledger.get("id1", "ctx2").context_id == "ctx2"


def test_create_inserts_and_returns_existing(ledger):  # :45-74
    assert ledger.create("k", "c", NOW) is None
    existing = ledger.create("k", "c", NOW + 50)
    assert existing is not None
    assert existing.started_at == NOW  # never mutated (:76-91)


def test_mark_completed_sets_result_and_expiry(ledger):  # :93-111
    ledger.create("k", "c", NOW)
    ledger.mark_completed("k", "c", {"rows": 10}, NOW + 5, ttl_s=100.0)
    p = ledger.get("k", "c")
    assert p.result is not None
    assert p.expires_on == NOW + 5 + 100.0
    assert p.started_at == NOW  # claim time preserved


def test_no_ttl_no_expiry(ledger):  # :113-130
    ledger.create("k", "c", NOW)
    ledger.mark_completed("k", "c", {"ok": True}, NOW + 5, ttl_s=None)
    assert ledger.get("k", "c").expires_on is None


def test_attempt_replacing_cas(ledger):  # :132-178
    ledger.create("k", "c", NOW)
    ledger.mark_completed("k", "c", {"ok": True}, NOW + 5, ttl_s=None)
    # wrong old_started_at -> CAS fails, row untouched
    assert ledger.attempt_replacing("k", "c", NOW - 123, NOW + 100) is False
    assert ledger.get("k", "c").result is not None
    # correct old_started_at -> claim reset, result/expiry cleared
    assert ledger.attempt_replacing("k", "c", NOW, NOW + 100) is True
    p = ledger.get("k", "c")
    assert p.started_at == NOW + 100
    assert p.result is None and p.expires_on is None
    # second contender with the stale timestamp loses (exactly-one-winner,
    # DeduplicationSuite.scala:99-119 analogue)
    assert ledger.attempt_replacing("k", "c", NOW, NOW + 101) is False


def test_status_lifecycle(ledger):
    assert ledger.status("k", "c", MPT, NOW) is Status.NOT_STARTED
    ledger.create("k", "c", NOW)
    assert ledger.status("k", "c", MPT, NOW + 1) is Status.RUNNING
    assert ledger.status("k", "c", MPT, NOW + MPT + 1) is Status.TIMEOUT
    ledger.mark_completed("k", "c", {"ok": 1}, NOW + 10, ttl_s=50.0)
    assert ledger.status("k", "c", MPT, NOW + 20) is Status.COMPLETED
    # TTL re-opens the key (DeduplicationSuite.scala:183-200 analogue)
    assert ledger.status("k", "c", MPT, NOW + 10 + 51) is Status.EXPIRED
