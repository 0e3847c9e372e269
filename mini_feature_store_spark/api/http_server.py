"""Stdlib HTTP transport for the feature-serving API.

Same route surface as the reference FastAPI app (``api/main.py:14-34``):

- ``GET /health``
- ``GET /features/online/{user_id}``
- ``GET /features/offline/{user_id}?as_of=ISO``

Implemented on ``http.server.ThreadingHTTPServer`` so the service runs (and
is integration-tested) with zero third-party web dependencies; the FastAPI
wiring in ``fastapi_app.py`` is preferred when the package is installed.
Serving is driver-side and single-process by design — the online path is a
KV GET (no Spark), and the offline path is explicitly a dev/debug endpoint
(reference api/offline.py:1-13).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from mini_feature_store_spark.api.service import (
    ApiError,
    OfflineFeatureService,
    OnlineFeatureService,
    health,
)


def _make_handler(
    online: OnlineFeatureService | None,
    offline: OfflineFeatureService | None,
):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test output
            pass

        def _send(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            parts = [p for p in url.path.split("/") if p]
            try:
                if parts == ["health"]:
                    self._send(200, health())
                elif len(parts) == 3 and parts[:2] == ["features", "online"]:
                    if online is None:
                        raise ApiError(503, "online store not configured")
                    resp = online.get(unquote(parts[2]))
                    self._send(200, resp.model_dump())
                elif len(parts) == 3 and parts[:2] == ["features", "offline"]:
                    if offline is None:
                        raise ApiError(503, "offline table not configured")
                    qs = parse_qs(url.query)
                    if "as_of" not in qs:
                        # FastAPI's required-Query contract → 422
                        raise ApiError(422, "as_of query parameter is required")
                    resp = offline.get(unquote(parts[2]), qs["as_of"][0])
                    self._send(200, resp.model_dump())
                else:
                    raise ApiError(404, "Not Found")
            except ApiError as e:
                self._send(e.status, {"detail": e.detail})
            except Exception as e:  # defense: never hang the socket
                self._send(500, {"detail": f"internal error: {e}"})

    return Handler


def make_server(
    online: OnlineFeatureService | None = None,
    offline: OfflineFeatureService | None = None,
    host: str = "127.0.0.1",
    port: int = 0,
) -> ThreadingHTTPServer:
    """Build (don't start) the server; ``port=0`` binds an ephemeral port
    (``server.server_address[1]`` tells you which — used by tests)."""
    return ThreadingHTTPServer((host, port), _make_handler(online, offline))


def serve_forever(
    online: OnlineFeatureService | None = None,
    offline: OfflineFeatureService | None = None,
    host: str = "0.0.0.0",
    port: int = 8000,
) -> None:  # pragma: no cover - interactive entry point
    srv = make_server(online, offline, host, port)
    print(f"feature API listening on http://{host}:{port}")
    srv.serve_forever()
