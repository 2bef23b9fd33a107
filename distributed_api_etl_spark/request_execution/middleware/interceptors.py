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


class PaginationMiddleware:
    """Multi-page fan-in: one source row -> N paged requests -> one bronze
    record whose ``body_text`` is the JSON array of page bodies.

    Sits OUTSIDE retry in the chain, so every page request gets the full
    retry/auth/telemetry treatment. Two modes:

    * ``page``: increment ``page_param`` from ``start_page`` until
      ``max_pages``, a non-success page, or (optionally) an empty list at
      ``stop_on_empty_json_path``;
    * ``cursor``: follow ``cursor_json_path`` from each page body into
      ``cursor_param`` until the cursor is null/missing or ``max_pages``.

    The reference has no pagination surface at all; any real API-ingestion
    workload needs it (this is worker-side Python — no Spark implications
    beyond response size, which ``max_pages`` bounds).
    """

    def __init__(
        self,
        mode: str = "page",
        page_param: str = "page",
        start_page: int = 1,
        max_pages: int = 10,
        cursor_param: str = "cursor",
        cursor_json_path: str = "next",
        stop_on_empty_json_path: str | None = None,
    ) -> None:
        self.mode = mode
        self.page_param = page_param
        self.start_page = start_page
        self.max_pages = max_pages
        self.cursor_param = cursor_param
        self.cursor_json_path = cursor_json_path
        self.stop_on_empty_json_path = stop_on_empty_json_path

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        pages: list = []
        total_attempts = 0
        result = exchange
        cursor = None
        for i in range(self.max_pages):
            if self.mode == "page":
                exchange.context.params[self.page_param] = str(self.start_page + i)
            elif cursor is not None:
                exchange.context.params[self.cursor_param] = str(cursor)
            result = await next_call(exchange)
            total_attempts += result.attempts
            parsed = None
            if result.body_text:
                try:
                    parsed = json.loads(result.body_text)
                except ValueError:
                    parsed = result.body_text  # non-JSON page kept verbatim
            pages.append(parsed)
            if not result.success:
                break
            if self.mode == "page":
                if self.stop_on_empty_json_path is not None and isinstance(parsed, dict):
                    if not parsed.get(self.stop_on_empty_json_path):
                        break
            else:
                cursor = parsed.get(self.cursor_json_path) if isinstance(parsed, dict) else None
                if cursor is None:
                    break
        result.body_text = json.dumps(pages, sort_keys=True)
        result.body = result.body_text.encode()
        result.attempts = total_attempts
        result.metadata.setdefault("pagination", {})["pages"] = len(pages)
        return result
