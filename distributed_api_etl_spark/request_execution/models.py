"""Row->request->response dataflow units.

Reference parity: RequestContext / RequestExchange / TransportRequest /
TransportResponse (src/request_execution/models.py:30-153), rebuilt with
typed bronze output (``build_record`` returns a dict keyed by bronze column
names — no positional Row alignment) and an injectable clock so dry-run
pipelines are fully deterministic.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any


@dataclass
class RequestContext:
    """One source row bound to a parameterized HTTP request."""

    method: str = "GET"
    url: str = ""
    headers: dict[str, str] = field(default_factory=dict)
    params: dict[str, str] = field(default_factory=dict)
    json_body: dict[str, Any] | None = None
    data: bytes | None = None
    timeout: float | None = None
    metadata: dict[str, Any] = field(default_factory=dict)
    row: dict[str, Any] = field(default_factory=dict)
    request_id: str = ""


@dataclass
class TransportRequest:
    """Wire-level request — decouples the HTTP engine from the pipeline."""

    method: str
    url: str
    headers: dict[str, str] = field(default_factory=dict)
    params: dict[str, str] = field(default_factory=dict)
    json_body: dict[str, Any] | None = None
    data: bytes | None = None
    timeout: float | None = None
    request_id: str = ""


@dataclass
class TransportResponse:
    status_code: int | None = None
    headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""
    error: str | None = None  # transport errors are data, never exceptions


@dataclass
class RequestExchange:
    """The unit that flows through the middleware chain."""

    context: RequestContext
    status_code: int | None = None
    response_headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""
    body_text: str | None = None
    success: bool = False
    error_message: str | None = None
    attempts: int = 0
    metadata: dict[str, Any] = field(default_factory=dict)

    def row_hash(self) -> str | None:
        if not self.body:
            return None
        return hashlib.sha256(self.body).hexdigest()

    def build_record(self, request_time: datetime | None = None) -> dict[str, Any]:
        """Typed bronze record (dict keyed by bronze column names)."""
        ts = request_time or datetime.now(timezone.utc).replace(tzinfo=None)
        return {
            "request_id": self.context.request_id,
            "row_hash": self.row_hash(),
            "url": self.context.url,
            "method": self.context.method,
            "request_headers": dict(self.context.headers),
            "request_params": {k: str(v) for k, v in self.context.params.items()},
            "request_metadata": json.dumps(self.context.metadata, sort_keys=True, default=str)
            if self.context.metadata
            else None,
            "status_code": self.status_code,
            "response_headers": json.dumps(self.response_headers, sort_keys=True)
            if self.response_headers
            else None,
            "body_text": self.body_text
            if self.body_text is not None
            else (self.body.decode("utf-8", errors="replace") if self.body else None),
            "success": self.success,
            "error_message": self.error_message,
            "attempts": self.attempts,
            "response_metadata": json.dumps(self.metadata, sort_keys=True, default=str)
            if self.metadata
            else None,
            "_request_time": ts,
        }
