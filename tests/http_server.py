"""Local mock API server for transport/auth integration tests (the
reference's strategy: a real HTTP server in a background thread, ephemeral
port, counting in-flight requests)."""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class MockApiServer:
    def __init__(self) -> None:
        self.in_flight = 0
        self.max_in_flight = 0
        self.request_count = 0
        self.flaky_seen: dict[str, int] = {}
        self.auth_headers: list[str] = []
        self.token_grants = 0
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 keep-alive: every reply carries Content-Length, so
            # clients can reuse connections — without this each request
            # pays a fresh TCP setup + server thread spawn, which distorts
            # concurrency measurements (and real APIs keep connections
            # alive, which is what the pooled transports are tuned for)
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # noqa: D102
                return

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, sort_keys=True).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                parsed = urllib.parse.urlparse(self.path)
                params = dict(urllib.parse.parse_qsl(parsed.query))
                with outer._lock:
                    outer.request_count += 1
                    outer.in_flight += 1
                    outer.max_in_flight = max(outer.max_in_flight, outer.in_flight)
                    if auth := self.headers.get("Authorization"):
                        outer.auth_headers.append(auth)
                try:
                    if parsed.path == "/ok":
                        time.sleep(0.002)
                        self._reply(200, {"echo": params})
                    elif parsed.path == "/slow":
                        # I/O-bound API emulation: latency from the ms param
                        time.sleep(float(params.get("ms", "50")) / 1000.0)
                        self._reply(200, {"echo": params})
                    elif parsed.path == "/flaky":
                        rid = params.get("id", "?")
                        with outer._lock:
                            n = outer.flaky_seen.get(rid, 0)
                            outer.flaky_seen[rid] = n + 1
                        if n < 2:
                            self._reply(503, {"error": "flaky"})
                        else:
                            self._reply(200, {"echo": params})
                    elif parsed.path == "/secured":
                        if not self.headers.get("Authorization", "").startswith("Bearer "):
                            self._reply(401, {"error": "unauthorized"})
                        else:
                            self._reply(200, {"echo": params})
                    else:
                        self._reply(404, {"error": "not found"})
                finally:
                    with outer._lock:
                        outer.in_flight -= 1

            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length).decode()
                fields = dict(urllib.parse.parse_qsl(raw))
                if self.path == "/oauth/token":
                    with outer._lock:
                        outer.token_grants += 1
                    if fields.get("client_secret") != "s3cret":
                        self._reply(401, {"error": "bad client"})
                        return
                    self._reply(
                        200,
                        {"access_token": f"tok-{outer.token_grants}", "expires_in": 3600},
                    )
                else:
                    self._reply(404, {"error": "not found"})

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._server.server_address[1]
        self.base_url = f"http://127.0.0.1:{self.port}"
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    def start(self) -> "MockApiServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
