"""Shared Spark fixture for the test suite (session-scoped: one JVM)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dedup.config import DedupConfig
    from dedup.session import build_session

    cfg = DedupConfig(shuffle_partitions=8)
    s = build_session("dedup-tests", master="local[8]", config=cfg)
    yield s
    s.stop()
