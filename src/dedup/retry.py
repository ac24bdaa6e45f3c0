"""Budgeted retry strategies — graft of the reference's pollStrategy config.

Reference: src/main/scala/deduplication/Config.scala:36-54 defines
PollStrategy.Linear (fixed interval within a max poll time) and
PollStrategy.Backoff (initial interval growing x1.5 per attempt, capped,
within a max poll time). The batch engine needs no peer polling — a stage
either finds a COMPLETED ledger row or recomputes (PARITY.md R16) — but the
reference also leans on these strategies wherever a conditional write can
lose a race. Here the optimistic-concurrency commit of the table-store
catalog (storage.TableStore.commit_many) retries under one of them, so a
multi-writer deployment degrades to bounded retries instead of lost updates.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass


class CommitConflict(Exception):
    """Optimistic-concurrency failure: someone else committed our version."""


@dataclass(frozen=True)
class RetryStrategy:
    """Delay schedule within a total budget.

    factor=1.0 reproduces the reference's Linear strategy (constant interval,
    Config.scala:38-44); factor=1.5 its Backoff strategy (Config.scala:46-54).
    `max_total_s` is the poll budget (maxPollTime): once the summed sleep
    would exceed it, no further delay is yielded and the caller gives up.
    """

    initial_delay_s: float = 0.02
    factor: float = 1.5
    max_delay_s: float = 0.5
    max_total_s: float = 5.0

    def __post_init__(self) -> None:
        if self.initial_delay_s <= 0 or self.factor < 1.0:
            raise ValueError("initial_delay_s > 0 and factor >= 1.0 required")

    def delays(self) -> Iterator[float]:
        """Sleep intervals; sum(delays()) <= max_total_s always holds."""
        total = 0.0
        d = self.initial_delay_s
        while True:
            step = min(d, self.max_delay_s)
            if total + step > self.max_total_s:
                return
            yield step
            total += step
            d *= self.factor


LINEAR = RetryStrategy(factor=1.0)
BACKOFF = RetryStrategy(factor=1.5)


def attempt_with_backoff(
    fn: Callable,
    strategy: RetryStrategy = BACKOFF,
    retry_on: tuple[type[BaseException], ...] = (CommitConflict,),
    sleep: Callable[[float], None] = time.sleep,
):
    """Run `fn`; on `retry_on` failures retry under the strategy's budget.

    Exhausting the budget re-raises the last failure — the analogue of the
    reference surfacing a timeout once maxPollTime is spent
    (DeduplicationSuite.scala:202-221 asserts exactly this give-up bound).
    """
    gen = strategy.delays()
    while True:
        try:
            return fn()
        except retry_on:
            delay = next(gen, None)
            if delay is None:
                raise
            sleep(delay)
