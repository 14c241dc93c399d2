"""Driver-side retry strategies (reference R14-R16).

In the reference these serialize contended writers (strategy/sync/impl/
*.kt); in a batch engine a deterministic window resolves all conflicts
in one pass (SURVEY.md §4), so retries survive only as driver-side
resilience for flaky I/O actions (cloud-storage writes, streaming
restarts). Semantics preserved exactly:

- none: one attempt; a retryable error is terminal
  (NoRetryStrategy.kt:9-16);
- fixed: up to ``times`` re-runs with a constant delay
  (FixedDelayRetryStrategy.kt:10-26);
- exponential: delay schedule ``initial_delay * e**n`` — the natural
  exponent, NOT 2**n (ExponentialDelayRetryStrategy.kt:29-30's
  kotlin.math.exp quirk, preserved deliberately);
- defaults: 3 retries (DeduplicationProviderBuilder.kt:28-33).

Async variants (R17) collapse into Spark's own scheduler and are a
non-goal (SURVEY.md R17).
"""

from __future__ import annotations

import math
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class RetryableError(Exception):
    """Raise inside an action to request a retry (the reference's
    RetryException, exception/RetryException.kt:3-8)."""


class RetriesExceededError(Exception):
    """All attempts exhausted (RetriesExceededException.kt:3-8)."""


def retry_none(action: Callable[[], T]) -> T:
    """One attempt; RetryableError becomes RetriesExceededError."""
    try:
        return action()
    except RetryableError as exc:
        raise RetriesExceededError(str(exc)) from exc


def retry_fixed(action: Callable[[], T], times: int = 3,
                delay_s: float = 1.0,
                _sleep: Callable[[float], None] = time.sleep) -> T:
    """Up to ``times`` re-runs with constant delay between attempts
    (total invocations = times + 1, matching
    FixedDelayRetryStrategyTest.kt:29-33)."""
    last: Exception | None = None
    for attempt in range(times + 1):
        try:
            return action()
        except RetryableError as exc:
            last = exc
            if attempt < times:
                _sleep(delay_s)
    raise RetriesExceededError(str(last)) from last


def retry_exponential(action: Callable[[], T], times: int = 3,
                      initial_delay_s: float = 1.0,
                      _sleep: Callable[[float], None] = time.sleep) -> T:
    """Delay before retry n (0-based) = initial_delay * e**n — the
    reference's natural-exponent schedule
    (ExponentialDelayRetryStrategy.kt:29-30)."""
    last: Exception | None = None
    for attempt in range(times + 1):
        try:
            return action()
        except RetryableError as exc:
            last = exc
            if attempt < times:
                _sleep(initial_delay_s * math.exp(attempt))
    raise RetriesExceededError(str(last)) from last
