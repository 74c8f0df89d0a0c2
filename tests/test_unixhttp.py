"""The ``http+unix://`` transport itself (``functions/unixhttp.py``).

No Spark, no subprocess: an in-process AF_UNIX HTTP server pins the
client's contract — JSON GET/POST round-trips, the error taxonomy the
shared retry policies rely on (HTTP >= 400 → ``urllib.error.HTTPError``,
dead endpoint → ``OSError``, malformed body → ``ValueError``), and the
URL convention. These run in EVERY sandbox, including the one that
forbids AF_INET binds (VERDICT r09 #1).
"""

from __future__ import annotations

import json
import threading
import urllib.error
from http.server import BaseHTTPRequestHandler

import pytest

from qa_data_pipeline_rag_llm_spark.functions.unixhttp import (
    UnixHTTPServer,
    open_json,
    split_unix_url,
    unix_url,
)


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path.startswith("/echo"):
            self._send(200, json.dumps({"path": self.path}).encode())
        elif self.path == "/teapot":
            self._send(418, b"{}")
        elif self.path == "/flaky503":
            self._send(503, b"{}")
        elif self.path == "/junk":
            self._send(200, b"this is not json")
        else:
            self._send(404, b"{}")

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if self.path == "/teapot":
            self._send(418, b"{}")
        else:
            self._send(200, json.dumps({"got": body}).encode())

    def log_message(self, *a):  # client_address is '' on AF_UNIX
        pass


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    sock = str(tmp_path_factory.mktemp("uhttp") / "s.sock")
    srv = UnixHTTPServer(sock, _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield sock
    srv.shutdown()


def test_url_convention_roundtrip():
    url = unix_url("/tmp/a b/x.sock", "/page?start=0&n=5")
    assert url.startswith("http+unix://")
    path, target = split_unix_url(url)
    assert path == "/tmp/a b/x.sock"
    assert target == "/page?start=0&n=5"
    assert split_unix_url("http://example/x") is None


def test_get_and_post_roundtrip(server):
    base = unix_url(server)
    assert open_json(base + "/echo?a=1") == {"path": "/echo?a=1"}
    assert open_json(base + "/echo", {"texts": ["x", "y"]}) == {
        "got": {"texts": ["x", "y"]}
    }


def test_error_taxonomy_matches_tcp_transport(server):
    """The shared retry policies branch on exception TYPE (4xx fail-fast
    vs transient retry) — both transports must raise identically."""
    base = unix_url(server)
    with pytest.raises(urllib.error.HTTPError) as e4:
        open_json(base + "/teapot")
    assert e4.value.code == 418
    assert isinstance(e4.value, urllib.error.URLError)  # pyapi's catch
    with pytest.raises(urllib.error.HTTPError) as e5:
        open_json(base + "/flaky503")
    assert e5.value.code == 503
    with pytest.raises(ValueError):  # malformed body -> fail fast
        open_json(base + "/junk")


def test_dead_socket_raises_oserror(tmp_path):
    with pytest.raises(OSError):
        open_json(unix_url(str(tmp_path / "never.sock")) + "/x")


def test_post_json_retry_policy_over_unix(server):
    """httpjson.post_json over the unix transport: 4xx fails fast (one
    request), 200 succeeds — the policy needs no scheme branches."""
    from qa_data_pipeline_rag_llm_spark.functions.httpjson import post_json

    base = unix_url(server)
    assert post_json(base + "/echo", {"k": 1}, 5.0, 2) == {"got": {"k": 1}}
    with pytest.raises(urllib.error.HTTPError):
        post_json(base + "/teapot", {}, 5.0, 2)
