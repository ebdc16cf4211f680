"""Retry + circuit-breaker semantics (SURVEY.md ops 48-49)."""

import pytest

from airflow_pipeline_text_processing_spark.streaming.reliability import (
    CircuitBreaker,
    CircuitOpenError,
    RetryConfig,
    RetryManager,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_retry_succeeds_after_transient_failures():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    rm = RetryManager(RetryConfig(max_retries=3), sleep=sleeps.append)
    assert rm.execute(flaky) == "ok"
    assert calls["n"] == 3 and len(sleeps) == 2
    # exponential envelope with 10% jitter: 1s then 2s nominal
    assert 0.9 <= sleeps[0] <= 1.1 and 1.8 <= sleeps[1] <= 2.2


def test_retry_exhaustion_reraises_last():
    rm = RetryManager(RetryConfig(max_retries=2), sleep=lambda *_: None)
    with pytest.raises(RuntimeError, match="always"):
        rm.execute(lambda: (_ for _ in ()).throw(RuntimeError("always")))


def test_non_retryable_short_circuits():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("no retry for this")

    rm = RetryManager(RetryConfig(max_retries=5), sleep=lambda *_: None)
    with pytest.raises(ValueError):
        rm.execute(bad)
    assert calls["n"] == 1


def test_delay_cap():
    rm = RetryManager(RetryConfig(max_retries=10, jitter_factor=0.0),
                      sleep=lambda *_: None)
    assert rm.delay_for(20) == 60.0


def test_circuit_breaker_lifecycle():
    clock = FakeClock()
    cb = CircuitBreaker(failure_threshold=5, cooldown_seconds=300,
                        close_after_successes=2, clock=clock)
    boom = lambda: (_ for _ in ()).throw(RuntimeError("x"))

    for _ in range(4):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    assert cb.state == "closed"
    with pytest.raises(RuntimeError):
        cb.call(boom)  # 5th consecutive failure opens
    assert cb.state == "open"
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: "nope")

    clock.t += 300  # cooldown elapsed -> half-open probe allowed
    assert cb.call(lambda: "ok1") == "ok1"
    assert cb.state == "half_open"
    assert cb.call(lambda: "ok2") == "ok2"
    assert cb.state == "closed"

    # half-open failure re-opens immediately
    for _ in range(5):
        with pytest.raises(RuntimeError):
            cb.call(boom)
    clock.t += 300
    assert cb.can_execute()
    with pytest.raises(RuntimeError):
        cb.call(boom)
    assert cb.state == "open"
