"""Spark 4 Python Data Source: the reference's paged-API scans as a
first-class ``spark.read.format(...)`` connector (SURVEY.md §2.1 S1/S3).

The reference ingests by paging HTTP APIs from a DRIVER loop —
``/root/reference/REDDIT-Ingestion.py:43-59`` (``safe_fetch_submissions``,
50-submission pages, 2 s rate delay) and ``STACK-Ingestion.py:40-64``
(retry with exponential backoff). The Spark-native shape of that connector
contract is a custom data source whose pages are input PARTITIONS: every
API page becomes one task, so fetch parallelism scales with executors
instead of a single driver loop, and the rows enter the engine already
schema'd (no CSV round-trip, no inferSchema).

Two transports share every other layer (planning, schema, offsets,
normalization):

* default — a deterministic local "page server" over the documents
  table, read with pyarrow DIRECTLY (deliberately not Spark's parquet
  reader — this code path stands where an HTTP client would), keeping
  the whole source oracle-checkable with zero infrastructure;
* ``base_url`` option — a REAL paged HTTP API: ``GET {base_url}/meta``
  advertises the total (the endpoint's cursor/total contract) and
  ``GET {base_url}/page?start=S&n=K`` serves one page, fetched FROM THE
  EXECUTOR TASK with the reference's retry-with-exponential-backoff
  policy (``STACK-Ingestion.py:40-64``) — per task, which is what makes
  the rate budget parallelizable. ``tests/test_pyapi_http.py`` drives
  both batch and micro-batch readers against a live (subprocess) flaky
  pager and asserts transport equivalence + exactly-once replay.

Row normalization mirrors the reference's ingest dicts
(``REDDIT-Ingestion.py:124-133``: ``t3_`` ids, capped titles, score).
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from qa_data_pipeline_rag_llm_spark.functions import unixhttp  # noqa: E402

cloudpickle.register_pickle_by_value(sys.modules[__name__])
# the transport helper travels by value too, so executor-side page
# fetches never depend on the package being importable in the worker
cloudpickle.register_pickle_by_value(unixhttp)

TITLE_CAP = 40
DEFAULT_PAGE_SIZE = 100


RETRIES = 4
BACKOFF_BASE_SEC = 0.2


def _local_total(path: str) -> int:
    """Row count from parquet metadata only — single file or a
    Spark-written DIRECTORY of part files (footers, no data read)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        import pyarrow.dataset as pads

        return sum(
            f.count_rows()
            for f in pads.dataset(path, format="parquet").get_fragments()
        )
    return pq.read_metadata(path).num_rows


def _fetch_page(path: str, start: int, page_size: int) -> list[dict]:
    """The 'HTTP GET' stand-in: one page of raw posts. pyarrow reads the
    backing table and slices the page — a real source issues the paged
    API request here (with the reference's rate delay / backoff policy
    applied PER TASK, which is what makes the budget parallelizable).
    Directory tables read through pyarrow's dataset layer (deterministic
    sorted file order, '_'-prefixed sidecars ignored), so page slicing
    stays stable across tasks."""
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=["doc_id", "text", "n_chars"])
    return table.slice(start, page_size).to_pylist()


def _http_json(url: str, timeout: float = 30.0):
    """GET a JSON endpoint with the reference's retry-with-exponential-
    backoff transport policy (``STACK-Ingestion.py:40-64``): transient
    failures (5xx, connection resets) retry up to RETRIES times with
    0.2·2^i sleeps; the final failure propagates so a dead API fails the
    task loudly instead of silently truncating the ingest. ``http://``
    goes through urllib; ``http+unix://`` sends the same bytes over an
    AF_UNIX socket (``functions/unixhttp.py``) — same error taxonomy,
    so the policy has no scheme branches."""
    import time
    import urllib.error

    last: Exception | None = None
    for attempt in range(RETRIES):
        try:
            return unixhttp.open_json(url, None, timeout)
        except (urllib.error.URLError, ConnectionError, OSError) as exc:
            last = exc
            time.sleep(BACKOFF_BASE_SEC * (2**attempt))
    raise last  # type: ignore[misc]


def _http_total(base_url: str) -> int:
    return int(_http_json(f"{base_url}/meta")["num_rows"])


def _http_page(base_url: str, start: int, page_size: int) -> list[dict]:
    return _http_json(f"{base_url}/page?start={start}&n={page_size}")["rows"]


class QAApiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.base_url = options.get("base_url")
        if not (self.path or self.base_url):
            raise ValueError("qa_api needs a path or base_url option")
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def partitions(self) -> list[InputPartition]:
        """Page planning = the API's pagination, done from metadata only
        (HTTP: the endpoint's advertised total; local: the parquet
        footer's row count)."""
        if self.base_url:
            n = _http_total(self.base_url)
        else:
            n = _local_total(self.path)
        pages = max(1, -(-n // self.page_size))
        return [InputPartition(i) for i in range(pages)]

    def read(self, partition: InputPartition):
        start = partition.value * self.page_size
        if self.base_url:
            rows = _http_page(self.base_url, start, self.page_size)
        else:
            rows = _fetch_page(self.path, start, self.page_size)
        for row in rows:
            yield _normalize_row(row, self.page_size)


def _normalize_row(row: dict, page_size: int) -> tuple:
    text = row["text"] or ""
    # python slicing and SQL substr both count codepoints
    return (
        f"t3_{row['doc_id']}",
        text[:TITLE_CAP],
        int(row["n_chars"]),
        int(row["doc_id"]) // page_size,
    )


class QAApiStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the reference's
    polling-with-sleep ingest loop (``REDDIT-Ingestion.py:57-59``) as a
    real Structured Streaming source — offset = next page number, one
    page per micro-batch, exactly-once via offset tracking
    (``readBetweenOffsets`` replays any page range on recovery). A live
    deployment's ``read`` would poll the API for pages past the cursor;
    here the page server is the same deterministic table the batch
    source reads, so stream output == batch output, oracle-checked."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.base_url = options.get("base_url")
        if not (self.path or self.base_url):
            raise ValueError("qa_api needs a path or base_url option")
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def _page(self, page: int) -> list[dict]:
        start = page * self.page_size
        if self.base_url:
            return _http_page(self.base_url, start, self.page_size)
        return _fetch_page(self.path, start, self.page_size)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        page = start["page"]
        rows = self._page(page)
        out = [_normalize_row(r, self.page_size) for r in rows]
        # advance only when the "API" returned data — an exhausted cursor
        # holds its offset (the polling steady-state)
        return iter(out), {"page": page + (1 if rows else 0)}

    def readBetweenOffsets(self, start: dict, end: dict):
        for page in range(start["page"], end["page"]):
            for r in self._page(page):
                yield _normalize_row(r, self.page_size)


class QAApiDataSource(DataSource):
    """``spark.read.format("qa_api")`` (batch) and
    ``spark.readStream.format("qa_api")`` (streaming) over the same
    page server."""

    @classmethod
    def name(cls) -> str:
        return "qa_api"

    def schema(self) -> str:
        return "id_post string, title string, score bigint, page int"

    def reader(self, schema) -> QAApiReader:
        return QAApiReader(self.options)

    def simpleStreamReader(self, schema) -> QAApiStreamReader:
        return QAApiStreamReader(self.options)


def register_qa_api(spark) -> None:
    """Idempotent registration of the qa_api format on a session."""
    try:
        spark.dataSource.register(QAApiDataSource)
    except Exception:
        pass  # already registered on this session


def run_api_stream(
    spark,
    path: str,
    page_size: int = DEFAULT_PAGE_SIZE,
    base_url: str | None = None,
):
    """Run the streaming source over every available page and return the
    appended result as a batch DataFrame. With ``base_url`` the pages
    come from the live HTTP pager instead of the local transport
    (``path`` then only sizes the expected-row guard).

    ``Trigger.AvailableNow`` drains only the prefetched first page of a
    Python simple stream reader (probed on this Spark build), so the
    query runs on a tight processing-time trigger and stops once the
    memory sink holds every backing row — the deterministic end state
    the page-number offsets guarantee (each page appended exactly once).
    """
    import time
    import uuid

    register_qa_api(spark)
    expected = _local_total(path)
    name = f"qa_api_{uuid.uuid4().hex}"
    reader = (
        spark.readStream.format("qa_api")
        .option("path", path)
        .option("page_size", str(page_size))
    )
    if base_url:
        reader = reader.option("base_url", base_url)
    df = reader.load()
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while spark.table(name).count() < expected:
            if q.exception() is not None:
                # surface the real root cause immediately instead of
                # burning the deadline and masking it as a TimeoutError
                # (review r03)
                raise q.exception()
            if time.time() >= deadline:
                # a silent partial return would look like an engine bug
                # downstream (hash mismatch / truncated data); fail loud.
                raise TimeoutError(
                    f"qa_api stream drained {spark.table(name).count()}"
                    f"/{expected} rows within 120s"
                )
            time.sleep(0.2)
    finally:
        q.stop()
    return spark.table(name).localCheckpoint(eager=True)
