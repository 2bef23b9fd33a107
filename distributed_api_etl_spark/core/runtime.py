"""Worker-process-scoped resource cache + token-bucket rate limiter.

``ProcessScope`` amortizes expensive resources (HTTP connection pools)
across Spark tasks within one Python worker process — effective because
``spark.python.worker.reuse`` defaults to true. Loop-bound resources
(aiohttp sessions) must NOT live here; the partition executor keeps those
task-scoped (see transport/base.py docstring).

``RateLimiter`` implements ``execution.max_requests_per_second`` for real
(documented-but-absent in the reference, docs/configuration.md:23,86).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from typing import Any, TypeVar

T = TypeVar("T")


class ProcessScope:
    """Lazy once-per-process factory cache, thread-safe."""

    _lock = threading.Lock()
    _instances: dict[str, Any] = {}

    @classmethod
    def get(cls, key: str, factory: Callable[[], T]) -> T:
        inst = cls._instances.get(key)
        if inst is None:
            with cls._lock:
                inst = cls._instances.get(key)
                if inst is None:
                    inst = factory()
                    cls._instances[key] = inst
        return inst

    @classmethod
    def clear(cls) -> None:
        with cls._lock:
            cls._instances.clear()


class RateLimiter:
    """Async token bucket: ``rate`` tokens/sec, burst capacity = ``rate``.

    awaitable ``acquire()`` sleeps just long enough to honor the rate; cheap
    enough to call per request. Monotonic-clock based, loop-agnostic.
    """

    def __init__(self, rate: float, capacity: float | None = None) -> None:
        if rate <= 0:
            raise ValueError("rate must be positive")
        self.rate = rate
        self.capacity = capacity if capacity is not None else max(1.0, rate)
        self._tokens = self.capacity
        self._last = time.monotonic()
        self._lock = None  # created lazily inside the running loop

    async def acquire(self) -> None:
        import asyncio

        if self._lock is None:
            self._lock = asyncio.Lock()
        async with self._lock:
            now = time.monotonic()
            self._tokens = min(self.capacity, self._tokens + (now - self._last) * self.rate)
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return
            deficit = (1.0 - self._tokens) / self.rate
            self._tokens = 0.0
            self._last += deficit  # account for the wait we are about to do
        await asyncio.sleep(deficit)
