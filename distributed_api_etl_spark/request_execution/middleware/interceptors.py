"""Response-side middleware: retry with backoff, JSON parse/validate.

Reference parity: src/request_execution/middleware/interceptors.py. Retries
never raise — exhaustion is recorded as data on the exchange (success=False,
error_message, attempts). Success semantics preserved from the reference:
transport-level success is status<500 (executor), JSON middleware tightens it
to status<400.
"""

from __future__ import annotations

import asyncio
import json
import random
from collections.abc import Callable

from distributed_api_etl_spark.request_execution.middleware.pipeline import NextCall
from distributed_api_etl_spark.request_execution.models import RequestExchange

DEFAULT_RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


class RetryMiddleware:
    """Exponential backoff with full jitter: delay ~ U(0, min(max_delay,
    base*2^attempt)). RNG and sleep are injectable for deterministic tests.
    """

    def __init__(
        self,
        max_attempts: int = 10,
        base_delay: float = 0.1,
        max_delay: float = 2.0,
        retry_statuses: frozenset[int] | list[int] = DEFAULT_RETRY_STATUSES,
        rng: random.Random | None = None,
        sleep: Callable[[float], "asyncio.Future"] | None = None,
    ) -> None:
        self.max_attempts = max_attempts
        self.base_delay = base_delay
        self.max_delay = max_delay
        self.retry_statuses = frozenset(retry_statuses)
        self._rng = rng or random.Random()
        self._sleep = sleep or asyncio.sleep

    def _should_retry(self, exchange: RequestExchange) -> bool:
        if exchange.error_message and exchange.status_code is None:
            return True  # transport-level failure (connection/timeout)
        return exchange.status_code in self.retry_statuses

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        attempt = 0
        result = exchange
        while True:
            result = await next_call(result)
            attempt += 1
            result.attempts = attempt
            if not self._should_retry(result) or attempt >= self.max_attempts:
                break
            delay = self._rng.uniform(
                0, min(self.max_delay, self.base_delay * (2 ** (attempt - 1)))
            )
            if delay > 0:
                await self._sleep(delay)
        if self._should_retry(result):
            result.success = False
            result.error_message = result.error_message or (
                f"retries exhausted after {result.attempts} attempts "
                f"(last status {result.status_code})"
            )
        return result


class JsonResponseMiddleware:
    """Decode body to text, record JSON validity, success = status < 400."""

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        result = await next_call(exchange)
        if result.body:
            result.body_text = result.body.decode("utf-8", errors="replace")
            try:
                json.loads(result.body_text)
                result.metadata["json"] = {"valid": True}
            except json.JSONDecodeError as exc:
                result.metadata["json"] = {"valid": False, "error": str(exc)}
        if result.status_code is not None:
            result.success = result.status_code < 400
        return result
