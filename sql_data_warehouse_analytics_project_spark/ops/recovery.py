"""Error recovery utilities (maps reference ``ErrorRecovery``,
``logs/error_handler.py:408-522``): retry with exponential backoff and a
circuit breaker. Driver-side wrappers around Spark actions — Spark's own
task retries handle executor-level failure; these guard whole jobs."""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any


def retry_with_backoff(
    fn: Callable[[], Any],
    *,
    max_retries: int = 3,
    base_delay: float = 1.0,
    backoff_multiplier: float = 2.0,
    on_retry: Callable[[int, Exception], None] | None = None,
) -> Any:
    """delay = base_delay × multiplier^attempt (reference defaults 3/1.0/2.0,
    ``bronze.py:191-196``). ``on_retry(attempt, error)`` hooks the WARNING
    log per retry; final exhaustion re-raises."""
    last: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            last = e
            if attempt == max_retries:
                break
            if on_retry is not None:
                on_retry(attempt + 1, e)
            time.sleep(base_delay * (backoff_multiplier**attempt))
    raise last  # type: ignore[misc]


class CircuitBreaker:
    """Open after ``failure_threshold`` consecutive failures; half-open
    after ``reset_timeout`` seconds (reference stub, error_handler.py:485-522)."""

    def __init__(self, failure_threshold: int = 5, reset_timeout: float = 60.0):
        self.failure_threshold = failure_threshold
        self.reset_timeout = reset_timeout
        self.failures = 0
        self.opened_at: float | None = None

    @property
    def state(self) -> str:
        if self.opened_at is None:
            return "CLOSED"
        if time.time() - self.opened_at >= self.reset_timeout:
            return "HALF_OPEN"
        return "OPEN"

    def call(self, fn: Callable[[], Any]) -> Any:
        if self.state == "OPEN":
            raise RuntimeError("circuit breaker is OPEN")
        try:
            result = fn()
        except Exception:
            self.failures += 1
            if self.failures >= self.failure_threshold:
                self.opened_at = time.time()
            raise
        else:
            self.failures = 0
            self.opened_at = None
            return result
