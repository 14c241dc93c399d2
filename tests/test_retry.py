"""Retry-strategy unit tests mirroring the reference's
(NoRetryStrategyTest.kt:14-32, FixedDelayRetryStrategyTest.kt:29-33,
ExponentialDelayRetryStrategyTest.kt:29-33): count invocations, assert
exception mapping, check the e^n delay schedule."""

import math

import pytest

from distributed_deduplicator_spark.retry import (
    RetryableError, RetriesExceededError,
    retry_none, retry_fixed, retry_exponential)


class Counter:
    def __init__(self, fail_times=10**9):
        self.calls = 0
        self.fail_times = fail_times

    def __call__(self):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise RetryableError(f"attempt {self.calls}")
        return "ok"


def test_none_single_invocation():
    c = Counter()
    with pytest.raises(RetriesExceededError):
        retry_none(c)
    assert c.calls == 1


def test_none_passthrough_success():
    assert retry_none(lambda: 42) == 42


def test_fixed_three_retries_four_invocations():
    c = Counter()
    with pytest.raises(RetriesExceededError):
        retry_fixed(c, times=3, delay_s=0, _sleep=lambda s: None)
    assert c.calls == 4  # FixedDelayRetryStrategyTest.kt:29-33


def test_fixed_recovers_midway():
    c = Counter(fail_times=2)
    assert retry_fixed(c, times=3, delay_s=0, _sleep=lambda s: None) == "ok"
    assert c.calls == 3


def test_exponential_delay_schedule_is_e_based():
    delays = []
    c = Counter()
    with pytest.raises(RetriesExceededError):
        retry_exponential(c, times=3, initial_delay_s=2.0,
                          _sleep=delays.append)
    assert c.calls == 4
    # initial * e^n, n = 0,1,2 (ExponentialDelayRetryStrategy.kt:29-30)
    assert delays == pytest.approx([2 * math.exp(0), 2 * math.exp(1),
                                    2 * math.exp(2)])


def test_non_retryable_errors_propagate_immediately():
    def boom():
        raise ValueError("user error")
    with pytest.raises(ValueError):
        retry_fixed(boom, times=3, delay_s=0, _sleep=lambda s: None)
