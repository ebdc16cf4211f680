"""Driver-side reliability: retry with backoff + jitter, circuit breaker.

Reference parity (SURVEY.md ops 48-49):

* Retry (``/root/reference/dags/dag.py:190-257``): delay = base * 2^attempt
  capped at a max, +/- jitter; a non-retryable exception allowlist short-
  circuits; the last error re-raises after exhaustion.
* Circuit breaker (``dags/dag.py:112-188``): CLOSED -> OPEN after N
  consecutive failures; OPEN -> HALF_OPEN after a cooldown; HALF_OPEN ->
  CLOSED after M consecutive successes, any failure re-opens.

These wrap whole Spark *job submissions* on the driver -- intra-job task
retries belong to Spark itself (``spark.task.maxFailures``).
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Callable, Tuple, Type


@dataclass
class RetryConfig:
    max_retries: int = 3          # ref dags/dag.py:94
    base_delay: float = 1.0       # ref :119-125
    max_delay: float = 60.0
    jitter_factor: float = 0.1
    non_retryable: Tuple[Type[BaseException], ...] = (
        FileNotFoundError,
        PermissionError,
        ValueError,
        TypeError,
    )  # ref :211-228


class RetryManager:
    def __init__(self, config: RetryConfig | None = None, sleep=time.sleep,
                 rng: random.Random | None = None):
        self.config = config or RetryConfig()
        self._sleep = sleep
        self._rng = rng or random.Random()

    def delay_for(self, attempt: int) -> float:
        d = min(self.config.base_delay * (2**attempt), self.config.max_delay)
        jitter = d * self.config.jitter_factor
        return max(0.0, d + self._rng.uniform(-jitter, jitter))

    def execute(self, fn: Callable, *args, **kwargs):
        last: BaseException | None = None
        for attempt in range(self.config.max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except self.config.non_retryable:
                raise
            except Exception as exc:  # noqa: BLE001 - reference retries broadly
                last = exc
                if attempt < self.config.max_retries:
                    self._sleep(self.delay_for(attempt))
        assert last is not None
        raise last


class CircuitOpenError(RuntimeError):
    pass


@dataclass
class CircuitBreaker:
    failure_threshold: int = 5     # ref dags/dag.py:88, :97
    cooldown_seconds: float = 300  # ref :127-132
    close_after_successes: int = 2
    clock: Callable[[], float] = time.monotonic

    state: str = field(default="closed", init=False)
    _failures: int = field(default=0, init=False)
    _successes: int = field(default=0, init=False)
    _opened_at: float = field(default=0.0, init=False)

    def can_execute(self) -> bool:
        if self.state == "open":
            if self.clock() - self._opened_at >= self.cooldown_seconds:
                self.state = "half_open"
                self._successes = 0
                return True
            return False
        return True

    def record_success(self) -> None:
        if self.state == "half_open":
            self._successes += 1
            if self._successes >= self.close_after_successes:
                self.state = "closed"
                self._failures = 0
        else:
            self._failures = 0

    def record_failure(self) -> None:
        if self.state == "half_open":
            self._open()
            return
        self._failures += 1
        if self._failures >= self.failure_threshold:
            self._open()

    def _open(self) -> None:
        self.state = "open"
        self._opened_at = self.clock()
        self._failures = 0

    def call(self, fn: Callable, *args, **kwargs):
        if not self.can_execute():
            raise CircuitOpenError("circuit breaker is open")
        try:
            result = fn(*args, **kwargs)
        except Exception:
            self.record_failure()
            raise
        self.record_success()
        return result
