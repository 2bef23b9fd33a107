"""Async interceptor chain.

Contract (reference parity: src/request_execution/middleware/pipeline.py):
each middleware is ``async (exchange, next_call) -> exchange``; it may mutate
the exchange before/after awaiting ``next_call(exchange)``, short-circuit by
not calling it, or call it multiple times (retry). The terminal handler
performs the actual transport send.
"""

from __future__ import annotations

from collections.abc import Awaitable, Callable

from distributed_api_etl_spark.request_execution.models import RequestExchange

NextCall = Callable[[RequestExchange], Awaitable[RequestExchange]]
Middleware = Callable[[RequestExchange, NextCall], Awaitable[RequestExchange]]


class MiddlewarePipeline:
    def __init__(self, middlewares: list[Middleware], terminal: NextCall) -> None:
        self._middlewares = list(middlewares)
        self._terminal = terminal

    async def execute(self, exchange: RequestExchange) -> RequestExchange:
        return await self._compose(0)(exchange)

    def _compose(self, index: int) -> NextCall:
        if index >= len(self._middlewares):
            return self._terminal
        mw = self._middlewares[index]
        nxt = self._compose(index + 1)

        async def call(exchange: RequestExchange) -> RequestExchange:
            return await mw(exchange, nxt)

        return call
