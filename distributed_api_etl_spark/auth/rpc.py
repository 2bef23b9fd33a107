"""Driver-side OAuth2 runtime: token manager + token RPC service.

The framework's signature feature (reference: src/auth/rpc/*,
src/auth/token/token_manager.py): the driver performs the OAuth grant once,
keeps the token fresh with a background refresh loop, and serves it to
workers over a tiny HTTP endpoint — N workers produce 1 token round-trip
instead of N. Workers fall back to direct grant if the RPC is unreachable
(auth/providers.py).

Implementation is stdlib-only (ThreadingHTTPServer + a daemon refresh
thread): no aiohttp dependency on the driver.
"""

from __future__ import annotations

import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from distributed_api_etl_spark.auth.models import Token
from distributed_api_etl_spark.auth.providers import fetch_token_direct


class DriverTokenManager:
    """Cached token with refresh-margin logic + 1s background refresh loop."""

    def __init__(self, auth: dict[str, Any], refresh_interval: float = 1.0) -> None:
        self._auth = auth
        self._margin = float(auth.get("refresh_margin", 60.0))
        self._interval = refresh_interval
        self._token: Token | None = None
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def get_token(self) -> Token:
        with self._lock:
            if self._token is None or self._token.is_expired(self._margin):
                self._token = fetch_token_direct(self._auth)
            return self._token

    def _loop(self) -> None:
        while not self._stop.wait(self._interval):
            try:
                self.get_token()
            except Exception:  # noqa: BLE001 - keep refreshing; workers fall back
                pass

    def start(self) -> None:
        self.get_token()  # fail fast on bad credentials
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)


class _TokenHandler(BaseHTTPRequestHandler):
    manager: DriverTokenManager = None  # type: ignore[assignment]

    def do_GET(self) -> None:  # noqa: N802 - http.server API
        if self.path.rstrip("/") != "/token":
            self.send_error(404)
            return
        try:
            token = self.manager.get_token()
        except Exception as exc:  # noqa: BLE001
            self.send_error(503, explain=str(exc))
            return
        body = json.dumps(token.to_json()).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args) -> None:  # silence per-request stderr noise
        return


class RpcBootstrapper:
    """Start/stop the token manager + RPC server; exposes ``rpc_url`` that
    the compile step injects into worker auth config."""

    def __init__(self, auth: dict[str, Any]) -> None:
        self._auth = auth
        self.manager = DriverTokenManager(auth)
        self._server: ThreadingHTTPServer | None = None
        self._server_thread: threading.Thread | None = None
        self.rpc_url: str | None = None

    def start(self) -> None:
        self.manager.start()
        if not self._auth.get("rpc_enabled", True):
            return
        port = int(self._auth.get("rpc_port", 0) or 0)
        handler = type("Handler", (_TokenHandler,), {"manager": self.manager})
        self._server = ThreadingHTTPServer(("0.0.0.0", port), handler)
        self._server_thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._server_thread.start()
        host = self._advertise_host()
        self.rpc_url = f"http://{host}:{self._server.server_address[1]}/token"
        # readiness probe: the server thread is accepting once serve_forever runs
        deadline = time.time() + 5.0
        while time.time() < deadline:
            try:
                with socket.create_connection(
                    ("127.0.0.1", self._server.server_address[1]), timeout=0.5
                ):
                    return
            except OSError:
                time.sleep(0.05)

    @staticmethod
    def _advertise_host() -> str:
        """Driver address reachable from executors (local mode: loopback)."""
        try:
            with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
                s.connect(("10.255.255.255", 1))
                return s.getsockname()[0]
        except OSError:
            return "127.0.0.1"

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
        self.manager.stop()
