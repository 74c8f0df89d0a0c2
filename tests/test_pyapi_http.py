"""The paged-API source over a LIVE HTTP pager (VERDICT r03 #2).

The one §2 operator whose transport had never moved real bytes: S1/S3's
paged ingest (reference ``REDDIT-Ingestion.py:43-59``,
``STACK-Ingestion.py:40-64``). Clones the ``test_model_backend_http``
pattern — a subprocess HTTP server pages the documents table — and
drives BOTH readers of ``sources/pyapi.py`` through it from executor
tasks:

  * batch: ``spark.read.format("qa_api").option("base_url", ...)``
    equals the local-transport read row-for-row;
  * micro-batch: the streaming reader drains every page exactly once
    into a memory sink;
  * replay: ``readBetweenOffsets`` re-fetches a committed page range
    bit-identically (the exactly-once recovery contract);
  * backoff: the server 503s the FIRST request for every distinct page
    (flaky mode), so every successful read in this file has already
    exercised the retry-with-exponential-backoff policy.

Transport adapts to the sandbox (VERDICT r09 #1): a TCP port where
AF_INET binds are allowed, an AF_UNIX socket (``http+unix://``,
``functions/unixhttp.py``) where they are not — the same HTTP bytes
through the same pager/client code either way, so nothing here skips.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

import pytest

from qa_data_pipeline_rag_llm_spark.sources.pyapi import (
    QAApiStreamReader,
    _http_total,
    register_qa_api,
    run_api_stream,
)
from tests.conftest import SF_DIR, http_listen_addr

REPO_ROOT = str(Path(__file__).parents[1])

DOCS = f"{SF_DIR}/documents.parquet"
PAGE = 37  # deliberately not a divisor of the row count

_SERVER = r"""
import json, sys, urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
import pyarrow.parquet as pq

TABLE = pq.read_table(sys.argv[2], columns=["doc_id", "text", "n_chars"])
FLAKY = len(sys.argv) > 3 and sys.argv[3] == "flaky"
seen = set()

class H(BaseHTTPRequestHandler):
    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(u.query))
        if u.path == "/meta":
            body = {"num_rows": TABLE.num_rows}
        elif u.path == "/page":
            start, n = int(q["start"]), int(q["n"])
            if FLAKY and start not in seen:
                seen.add(start)
                self.send_response(503)
                self.end_headers()
                return
            body = {"rows": TABLE.slice(start, n).to_pylist()}
        else:
            self.send_response(404)
            self.end_headers()
            return
        out = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass

from qa_data_pipeline_rag_llm_spark.functions.unixhttp import serve_forever
serve_forever(sys.argv[1], H)
"""


def _spawn_pager(addr_spec: str, url: str):
    proc = subprocess.Popen(
        [sys.executable, "-c", _SERVER, addr_spec, DOCS, "flaky"],
        env={**os.environ, "PYTHONPATH": REPO_ROOT},
    )
    for _ in range(50):  # wait for the listener (meta is never flaky)
        try:
            _http_total(url)
            return proc
        except Exception:
            time.sleep(0.1)
    proc.kill()
    pytest.skip("pager server did not come up")


@pytest.fixture(scope="module")
def pager():
    addr_spec, url = http_listen_addr("pager")
    proc = _spawn_pager(addr_spec, url)
    yield url
    proc.kill()
    proc.wait()


@pytest.fixture(scope="module")
def unix_pager():
    """Always-AF_UNIX pager, so the ``http+unix://`` transport is
    exercised even on hosts where TCP works and ``pager`` picks it."""
    import tempfile

    from qa_data_pipeline_rag_llm_spark.functions.unixhttp import unix_url

    sock = os.path.join(tempfile.mkdtemp(prefix="qa_http_"), "pager.sock")
    proc = _spawn_pager(sock, unix_url(sock))
    yield unix_url(sock)
    proc.kill()
    proc.wait()


def _batch(spark, **opts):
    register_qa_api(spark)
    r = spark.read.format("qa_api").option("page_size", str(PAGE))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_http_transport_equals_local(spark, pager):
    got = sorted(map(tuple, _batch(spark, base_url=pager).collect()))
    want = sorted(map(tuple, _batch(spark, path=DOCS).collect()))
    assert got == want
    assert len(got) > 0


def test_stream_http_drains_every_page_exactly_once(spark, pager):
    out = run_api_stream(spark, DOCS, page_size=PAGE, base_url=pager)
    rows = out.collect()
    import pyarrow.parquet as pq

    expected = pq.read_metadata(DOCS).num_rows
    assert len(rows) == expected
    ids = [r.id_post for r in rows]
    assert len(set(ids)) == expected  # no page appended twice


def test_offset_replay_is_bit_identical(pager):
    """Recovery contract: re-reading a committed offset range must
    reproduce the original rows exactly — same pages, same order."""
    reader = QAApiStreamReader({"base_url": pager, "page_size": str(PAGE)})
    first, off1 = reader.read(reader.initialOffset())
    second, off2 = reader.read(off1)
    live = list(first) + list(second)
    assert off2 == {"page": 2}
    replay = list(
        reader.readBetweenOffsets(reader.initialOffset(), off2)
    )
    assert replay == live
    assert len(replay) == 2 * PAGE


def test_unix_transport_batch_equals_local(spark, unix_pager):
    """The AF_UNIX transport end-to-end through Spark executor tasks:
    identical rows to the local transport — pinned explicitly so the
    ``http+unix://`` path is proven even on hosts where the adaptive
    ``pager`` fixture picked TCP."""
    got = sorted(map(tuple, _batch(spark, base_url=unix_pager).collect()))
    want = sorted(map(tuple, _batch(spark, path=DOCS).collect()))
    assert got == want and len(got) > 0


def test_dead_endpoint_fails_loud(tmp_path):
    """RETRIES exhausted → the transport raises (a dead API must never
    silently truncate an ingest). Uses a never-bound unix socket path —
    dead on every sandbox, no AF_INET needed."""
    from qa_data_pipeline_rag_llm_spark.functions.unixhttp import unix_url
    from qa_data_pipeline_rag_llm_spark.sources import pyapi

    dead = unix_url(str(tmp_path / "never_bound.sock"))
    t0 = time.time()
    with pytest.raises(Exception):
        pyapi._http_page(dead, 0, 10)
    # and it actually backed off (0.2+0.4+0.8 s floor) instead of
    # hammering the endpoint
    assert time.time() - t0 >= 1.0
