"""Health probe + app health — O14 (Environment.scala:66-98,
RuntimeService.scala:15-25, core reference.conf:39-42).

Healthy iff setup succeeded, neither sink has erred, and the last batch
progress is younger than unhealthyLatency (2 min default)."""

from __future__ import annotations

import http.server
import threading
import time
from dataclasses import dataclass, field


@dataclass
class AppHealth:
    setup_ok: bool = True
    blob_sink_ok: bool = True
    bad_sink_ok: bool = True
    unhealthy_latency_seconds: float = 120.0
    _last_progress: float = field(default_factory=time.monotonic)

    def mark_progress(self) -> None:
        self._last_progress = time.monotonic()

    @property
    def progress_age(self) -> float:
        return time.monotonic() - self._last_progress

    def is_healthy(self, require_progress: bool = False) -> bool:
        if not (self.setup_ok and self.blob_sink_ok and self.bad_sink_ok):
            return False
        if require_progress and self.progress_age > self.unhealthy_latency_seconds:
            return False
        return True


class HealthProbe:
    """Tiny HTTP server: `/` or `/health` -> liveness (reference
    healthProbe.port 8000); `/metrics` -> Prometheus text exposition
    (reference wires a prometheus registry, core reference.conf:36)."""

    def __init__(
        self,
        health: AppHealth,
        port: int = 8000,
        require_progress: bool = False,
        metrics_snapshot=None,
    ):
        self.health = health
        self.port = port
        self.require_progress = require_progress
        self.metrics_snapshot = metrics_snapshot  # () -> dict[str, number]
        self._server: http.server.HTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> int:
        health = self.health
        require_progress = self.require_progress
        snapshot = self.metrics_snapshot

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.rstrip("/") == "/metrics":
                    body = "".join(
                        f"# TYPE snowplow_loader_{k} gauge\nsnowplow_loader_{k} {v}\n"
                        for k, v in (snapshot() if snapshot else {}).items()
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                    self.end_headers()
                    self.wfile.write(body)
                    return
                ok = health.is_healthy(require_progress)
                self.send_response(200 if ok else 503)
                self.end_headers()
                self.wfile.write(b"OK" if ok else b"UNHEALTHY")

            def log_message(self, *a):  # silence
                pass

        self._server = http.server.HTTPServer(("127.0.0.1", self.port), Handler)
        self.port = self._server.server_port
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server = None
