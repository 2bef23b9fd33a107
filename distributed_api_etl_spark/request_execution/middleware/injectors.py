"""Request-side middleware: mutate the outgoing context, then delegate.

Reference parity: src/request_execution/middleware/injectors.py (param
injection, basic/bearer auth, logging, timing, worker identity). All are
plain picklable classes built from config dicts on the driver.
"""

from __future__ import annotations

import base64
import os
import socket
import threading
import time
from collections.abc import Awaitable, Callable
from typing import Any

from distributed_api_etl_spark.request_execution.middleware.pipeline import NextCall
from distributed_api_etl_spark.request_execution.models import RequestExchange

_TRANSFORMS: dict[str, Callable[[str], str]] = {
    "upper": str.upper,
    "lower": str.lower,
    "strip": str.strip,
}


class ParamInjectorMiddleware:
    """Bind mapped source-row columns into query params (auto-prepended).

    Implements ``ColumnMapping.transform`` for real (declared-but-dead in the
    reference, data_contract.py:167-170).
    """

    def __init__(self, mapping: list[tuple[str, str, str | None]]) -> None:
        # [(endpoint_param, source_column, transform|None)]
        self.mapping = mapping

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        row = exchange.context.row
        for param, column, transform in self.mapping:
            value = row.get(column)
            if value is None:
                continue
            text = str(value)
            if transform:
                text = _TRANSFORMS[transform](text)
            exchange.context.params[param] = text
        return await next_call(exchange)


class _RowMap(dict):
    """format_map source: missing columns render as empty string (a row
    simply lacking an optional field must not fail the whole request)."""

    def __missing__(self, key: str) -> str:
        return ""


class RequestTemplateMiddleware:
    """Render ``endpoint.request_template`` into the JSON body per row.

    String leaves are ``str.format_map``-substituted with the source row
    (``{column}`` placeholders); non-string leaves pass through untouched.
    Runs before JsonBodyInjector, so explicit mappings override template
    keys on collision.
    """

    def __init__(self, template: dict[str, Any]) -> None:
        self.template = template

    def _render(self, node: Any, row: _RowMap) -> Any:
        if isinstance(node, str):
            try:
                return node.format_map(row)
            except ValueError:
                # malformed format string (stray brace): config-time
                # validation rejects these; if one slips through, a literal
                # pass-through must not kill the whole partition
                return node
        if isinstance(node, dict):
            return {k: self._render(v, row) for k, v in node.items()}
        if isinstance(node, list):
            return [self._render(v, row) for v in node]
        return node

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        row = _RowMap(
            {k: ("" if v is None else v) for k, v in (exchange.context.row or {}).items()}
        )
        body = self._render(self.template, row)
        existing = exchange.context.json_body or {}
        body.update(existing)  # explicit body keys win over template keys
        exchange.context.json_body = body
        return await next_call(exchange)


class JsonBodyInjectorMiddleware:
    """Bind mapped source-row columns into the JSON request body (POST/PUT)."""

    def __init__(self, mapping: list[tuple[str, str, str | None]]) -> None:
        self.mapping = mapping

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        row = exchange.context.row
        body = exchange.context.json_body or {}
        for param, column, transform in self.mapping:
            value = row.get(column)
            if value is None:
                continue
            if transform and isinstance(value, str):
                value = _TRANSFORMS[transform](value)
            body[param] = value
        exchange.context.json_body = body or None
        return await next_call(exchange)


class BasicAuthMiddleware:
    def __init__(self, username: str, password: str) -> None:
        creds = f"{username}:{password}".encode()
        self._header = "Basic " + base64.b64encode(creds).decode()

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        exchange.context.headers["Authorization"] = self._header
        return await next_call(exchange)


class BearerTokenMiddleware:
    """Authorization: Bearer <token> from an async token provider."""

    def __init__(self, token_provider: Any) -> None:
        # token_provider: object with ``async get_token() -> str`` or a plain str
        self._provider = token_provider

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        if isinstance(self._provider, str):
            token = self._provider
        else:
            token = await self._provider.get_token()
            exchange.metadata.setdefault("auth", {})["provider"] = type(
                self._provider
            ).__name__
        exchange.context.headers["Authorization"] = f"Bearer {token}"
        return await next_call(exchange)


class LoggingMiddleware:
    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        logs = exchange.metadata.setdefault("logs", [])
        logs.append(f"-> {exchange.context.method} {exchange.context.url}")
        result = await next_call(exchange)
        logs.append(f"<- {result.status_code} {exchange.context.url}")
        return result


class TimingMiddleware:
    """Per-request wall timing into response metadata.

    ``started_monotonic`` is the pipeline entry instant on the worker's
    monotonic clock — the request's ISSUE time, taken AFTER the token
    bucket's acquire (the rate limiter gates entry in the consumer loop),
    so a downstream aggregation over a partition's starts observes the
    limiter-shaped issue schedule: count <= burst + rate * (max(start) -
    min(start)) is the token-bucket invariant the rate-limit audit query
    grades. Monotonic values compare only WITHIN one partition's chunk
    (same process, same clock) — never across partitions or runs.
    """

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        start = time.monotonic()
        result = await next_call(exchange)
        timing = result.metadata.setdefault("timing", {})
        timing["started_monotonic"] = start
        timing["total_seconds"] = time.monotonic() - start
        return result


class TransportDiagnosticsMiddleware:
    """Transport-level diagnostics into response metadata: engine class,
    pool limit, and (when a warmup probe ran) its DNS/TCP/TLS timings.

    A discrete middleware toggled by ``transport.diagnostics`` — reference
    parity: src/request_execution/middleware/injectors.py:172-199
    (``TransportDiagnosticMiddleware``); previously this metadata was
    inlined unconditionally in the partition executor.
    """

    def __init__(
        self, engine_info: dict[str, Any], warmup_meta: dict[str, Any] | None = None
    ) -> None:
        self._engine_info = engine_info
        self._warmup = warmup_meta

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        diag = exchange.metadata.setdefault("transport", {})
        diag.update(self._engine_info)
        if self._warmup is not None:
            diag["connection_warmup"] = self._warmup
        return await next_call(exchange)


class WorkerIdentityMiddleware:
    """Hostname/pid/thread/executor-id diagnostics into response metadata."""

    async def __call__(self, exchange: RequestExchange, next_call: NextCall) -> RequestExchange:
        exchange.metadata["executor_identity"] = {
            "hostname": socket.gethostname(),
            "pid": os.getpid(),
            "thread_id": threading.get_ident(),
            "spark_executor_id": os.environ.get("SPARK_EXECUTOR_ID"),
        }
        return await next_call(exchange)
