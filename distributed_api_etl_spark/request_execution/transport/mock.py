"""Deterministic in-process transport for dry runs, tests, and the graded
flagship pipeline (no sockets, no clocks unless asked).

Default responder echoes the request params as canonical JSON:
``{"a": "1", "b": "x"}`` (sorted keys, ``", "``/``": "`` separators) with
status 200 — trivially reproducible in ANSI SQL for the DuckDB oracle.

Failure injection: ``fail_first_attempts=N`` makes each distinct request_id
fail with ``fail_status`` for its first N sends — exercises the retry
middleware deterministically.
"""

from __future__ import annotations

import asyncio
import json
from collections.abc import Callable

from distributed_api_etl_spark.request_execution.models import (
    TransportRequest,
    TransportResponse,
)
from distributed_api_etl_spark.request_execution.transport.base import TransportEngine

Responder = Callable[[TransportRequest], TransportResponse]


def default_responder(request: TransportRequest) -> TransportResponse:
    echoed = {k: str(v) for k, v in request.params.items()}
    if request.json_body is not None:
        # body keys echo under their own names (params win on collision so
        # param-only pipelines keep a byte-identical response shape)
        echoed = {**{k: str(v) for k, v in request.json_body.items()}, **echoed}
    body = json.dumps(echoed, sort_keys=True).encode()
    return TransportResponse(
        status_code=200, headers={"content-type": "application/json"}, body=body
    )


class MockEngine(TransportEngine):
    loop_bound = False

    def __init__(
        self,
        responder: Responder | None = None,
        latency: float = 0.0,
        fail_first_attempts: int = 0,
        fail_status: int = 503,
    ) -> None:
        self._responder = responder or default_responder
        self._latency = latency
        self._fail_first = fail_first_attempts
        self._fail_status = fail_status
        self._seen: dict[str, int] = {}
        self.sent_count = 0

    async def send(self, request: TransportRequest) -> TransportResponse:
        self.sent_count += 1
        if self._latency > 0:
            await asyncio.sleep(self._latency)
        if self._fail_first > 0:
            n = self._seen.get(request.request_id, 0)
            self._seen[request.request_id] = n + 1
            if n < self._fail_first:
                return TransportResponse(
                    status_code=self._fail_status,
                    headers={},
                    body=b'{"error": "injected"}',
                )
        return self._responder(request)
