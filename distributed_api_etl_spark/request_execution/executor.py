"""Terminal request executor: context -> TransportRequest -> exchange.

Reference parity: RequestExecutor.send (src/request_execution/executor.py:
20-67). Transport-level success is status<500 with no transport error; the
JSON middleware tightens it to <400 downstream (the reference's two-level
semantics, preserved deliberately — SURVEY §7.4 #5).
"""

from __future__ import annotations

from distributed_api_etl_spark.request_execution.models import (
    RequestExchange,
    TransportRequest,
)
from distributed_api_etl_spark.request_execution.transport.base import TransportEngine


class RequestExecutor:
    def __init__(self, engine: TransportEngine) -> None:
        self._engine = engine

    async def send(self, exchange: RequestExchange) -> RequestExchange:
        ctx = exchange.context
        request = TransportRequest(
            method=ctx.method,
            url=ctx.url,
            headers=dict(ctx.headers),
            params=dict(ctx.params),
            json_body=ctx.json_body,
            data=ctx.data,
            timeout=ctx.timeout,
            request_id=ctx.request_id,
        )
        response = await self._engine.send(request)
        exchange.status_code = response.status_code
        exchange.response_headers = dict(response.headers)
        exchange.body = response.body
        if response.error is not None:
            exchange.success = False
            exchange.error_message = response.error
        else:
            exchange.success = (
                response.status_code is not None and response.status_code < 500
            )
            exchange.error_message = None
        return exchange
