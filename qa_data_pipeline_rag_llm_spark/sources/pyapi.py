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


PAGE_COLUMNS = ["doc_id", "text", "n_chars"]

# Process-level caches (r11). Spark reuses Python worker processes
# (spark.python.worker.reuse, default true), so page tasks landing on
# the same worker share these — the metadata index is built once per
# table and the LAST decoded slab (one row group) is kept, bounding
# memory to a single row group while making the common access pattern
# (consecutive pages of one table) O(page) instead of O(table). The
# simple stream reader runs driver-side, where the same two dicts make
# its per-micro-batch page fetch O(page) too. A real page SERVER does
# exactly this work server-side; before r11 the local stand-in re-read
# and re-decoded the whole table for every page request — O(n²/page)
# aggregate, the dominant term of the honest sf1 cost measured in
# SCALING.md (pysource_api_stream 76 s for 500k rows).
_INDEX_CACHE: dict[str, tuple] = {}  # path -> (freshness token, entries)
_SLAB_CACHE: dict[str, tuple] = {}  # "slab" -> ((path, token, idx), table)


_TOKEN_MEMO: dict[str, tuple[int, tuple]] = {}  # path -> (monotonic_ns, token)


def _freshness_token(path: str, ttl_ns: int = 0):
    """Cache-invalidation token for a parquet table. A directory's own
    mtime does NOT change when a part file is rewritten in place, so
    directory tables token on every data file's (relpath, mtime_ns,
    size) — walked RECURSIVELY, because ``pads.dataset`` discovers
    nested fragments (e.g. a partitionBy layout) that a top-level scan
    would be blind to (review r11). A file that vanishes between
    listing and stat (concurrent rewrite) is skipped rather than
    raised: its absence already changes the token, and the next fetch
    re-indexes.

    ``ttl_ns`` (ADVICE r11): the walk is O(files) and runs on every page
    fetch even on index-cache hits, so a many-file directory table with
    a small page_size pays per-page metadata cost. The default 0 keeps
    strict freshness (a rewrite is visible on the very next fetch — the
    review-r11 pin). A positive TTL memoizes the token per process for
    that long, trading staleness ≤ TTL for O(1) metadata on the hot
    paging path — the right setting when the backing table is an
    immutable snapshot, which is what a production page server serves.
    Opt in via the reader option ``freshness_ttl_ms``."""
    import os
    import time

    if ttl_ns > 0:
        hit = _TOKEN_MEMO.get(path)
        if hit is not None and time.monotonic_ns() - hit[0] <= ttl_ns:
            return hit[1]
    if os.path.isdir(path):
        stats = []
        for root, dirs, files in os.walk(path):
            dirs[:] = sorted(
                d for d in dirs if not d.startswith(("_", "."))
            )
            for name in files:
                if name.startswith(("_", ".")):
                    continue
                try:
                    st = os.stat(os.path.join(root, name))
                except OSError:
                    continue
                rel = os.path.relpath(os.path.join(root, name), path)
                stats.append((rel, st.st_mtime_ns, st.st_size))
        token: tuple = tuple(sorted(stats))
    else:
        st = os.stat(path)
        token = (st.st_mtime_ns, st.st_size)
    if ttl_ns > 0:
        _TOKEN_MEMO[path] = (time.monotonic_ns(), token)
    return token


def _page_index(path: str, ttl_ns: int = 0) -> tuple:
    """Metadata-only slab index of a parquet table — ``(token,
    [(cum_start_row, n_rows, handle), ...])`` with slabs in the table's
    row order — footers only, no data pages decoded. ``handle`` is a
    row-group ordinal for a single file, a one-row-group dataset
    fragment for a Spark-written DIRECTORY table (pyarrow dataset
    discovery order = sorted file order, '_'-prefixed sidecars ignored —
    the same order ``pq.read_table`` concatenates, pinned by
    test_pyapi_paging). The token rides into the slab-cache key so a
    table REWRITTEN at the same path can never serve stale page bytes
    (review r11)."""
    import os

    token = _freshness_token(path, ttl_ns)
    hit = _INDEX_CACHE.get(path)
    if hit is not None and hit[0] == token:
        return hit
    entries: list = []
    cum = 0
    if os.path.isdir(path):
        import pyarrow.dataset as pads

        for frag in pads.dataset(path, format="parquet").get_fragments():
            for piece in frag.split_by_row_group():
                n = piece.row_groups[0].num_rows
                entries.append((cum, n, piece))
                cum += n
    else:
        import pyarrow.parquet as pq

        md = pq.read_metadata(path)
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            entries.append((cum, n, i))
            cum += n
    hit = (token, entries)
    _INDEX_CACHE[path] = hit
    return hit


def _read_slab(path: str, token, idx: int, entries: list):
    """Decode ONE row group (single-entry cache: consecutive pages of
    the same slab decode it once per process, and memory stays bounded
    by one row group no matter how large the table is). The freshness
    token is part of the cache key — same path + same slab ordinal but
    a rewritten table misses and re-decodes."""
    key = (path, token, idx)
    cached = _SLAB_CACHE.get("slab")
    if cached is not None and cached[0] == key:
        return cached[1]
    handle = entries[idx][2]
    if isinstance(handle, int):
        import pyarrow.parquet as pq

        t = pq.ParquetFile(path).read_row_group(handle, columns=PAGE_COLUMNS)
    else:
        t = handle.to_table(columns=PAGE_COLUMNS)
    _SLAB_CACHE["slab"] = (key, t)
    return t


def _fetch_page_table(path: str, start: int, page_size: int, ttl_ns: int = 0):
    """The 'HTTP GET' stand-in: one page of raw posts as a pyarrow
    Table. A real source issues the paged API request here (with the
    reference's rate delay / backoff policy applied PER TASK, which is
    what makes the budget parallelizable); the local transport reads
    ONLY the row group(s) overlapping the page (footer-pruned via
    ``_page_index``), so per-request work is O(row group), amortized
    O(page) under worker reuse — the cost profile a real page server
    has, and the shape that still works when the backing table is far
    larger than any worker's memory. Returns None for an empty page."""
    from bisect import bisect_right

    token, entries = _page_index(path, ttl_ns)
    if not entries:
        return None
    stop = start + page_size
    starts = [e[0] for e in entries]
    parts = []
    for idx in range(max(0, bisect_right(starts, start) - 1), len(entries)):
        cum, n, _ = entries[idx]
        if cum >= stop:
            break
        if cum + n <= start:
            continue
        lo = max(start, cum)
        hi = min(stop, cum + n)
        parts.append(
            _read_slab(path, token, idx, entries).slice(lo - cum, hi - lo)
        )
    if not parts:
        return None
    import pyarrow as pa

    return pa.concat_tables(parts)


def _fetch_page(path: str, start: int, page_size: int, ttl_ns: int = 0) -> list[dict]:
    """Row-dict page view over ``_fetch_page_table`` (the streaming
    reader's per-row path; the batch reader stays Arrow end to end)."""
    t = _fetch_page_table(path, start, page_size, ttl_ns)
    return t.to_pylist() if t is not None else []


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
        self.ttl_ns = int(float(options.get("freshness_ttl_ms", 0)) * 1e6)

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
        """Yields ONE Arrow RecordBatch per page (Spark 4's Python Data
        Source Arrow path): the page crosses the Python→JVM boundary as
        a single Arrow buffer instead of page_size pickled tuples, and
        normalization runs vectorized (pyarrow.compute) instead of
        per-row. Row values are pinned byte-identical to the streaming
        reader's ``_normalize_row`` by test_pyapi_paging."""
        import pyarrow as pa

        start = partition.value * self.page_size
        if self.base_url:
            rows = _http_page(self.base_url, start, self.page_size)
            t = pa.Table.from_pylist(rows) if rows else None
        else:
            t = _fetch_page_table(self.path, start, self.page_size, self.ttl_ns)
        if t is not None and t.num_rows:
            yield from _normalize_batches(t, self.page_size)


def _normalize_batches(t, page_size: int):
    """Vectorized twin of ``_normalize_row`` over an Arrow page table —
    same fields, same codepoint semantics (``utf8_slice_codeunits``
    slices codepoints, like Python ``text[:40]`` and SQL substr)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    doc_id = pc.cast(t["doc_id"], pa.int64())
    text = pc.fill_null(pc.cast(t["text"], pa.string()), "")
    out = pa.table(
        {
            "id_post": pc.binary_join_element_wise(
                "t3_", pc.cast(doc_id, pa.string()), ""
            ),
            "title": pc.utf8_slice_codeunits(text, 0, TITLE_CAP),
            "score": pc.cast(t["n_chars"], pa.int64()),
            # arrow integer divide truncates; doc_ids are non-negative,
            # so it matches Python's floor division in _normalize_row
            "page": pc.cast(
                pc.divide(doc_id, pa.scalar(page_size, pa.int64())),
                pa.int32(),
            ),
        }
    )
    yield from out.combine_chunks().to_batches()


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
    real Structured Streaming source — offset = next page number,
    ``pages_per_batch`` pages per micro-batch (default 1 = the strict
    poll cadence; a catch-up consumer raises it so backfill isn't one
    micro-batch per page — the offset contract is unchanged because
    offsets are page numbers either way), exactly-once via offset
    tracking (``readBetweenOffsets`` replays any page range on
    recovery). A live deployment's ``read`` would poll the API for
    pages past the cursor; here the page server is the same
    deterministic table the batch source reads, so stream output ==
    batch output, oracle-checked."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.base_url = options.get("base_url")
        if not (self.path or self.base_url):
            raise ValueError("qa_api needs a path or base_url option")
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))
        self.pages_per_batch = int(options.get("pages_per_batch", 1))
        self.ttl_ns = int(float(options.get("freshness_ttl_ms", 0)) * 1e6)

    def _page(self, page: int) -> list[dict]:
        start = page * self.page_size
        if self.base_url:
            return _http_page(self.base_url, start, self.page_size)
        return _fetch_page(self.path, start, self.page_size, self.ttl_ns)

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        page = start["page"]
        out: list[tuple] = []
        advanced = 0
        for i in range(self.pages_per_batch):
            rows = self._page(page + i)
            if not rows:
                # advance only through pages that returned data — an
                # exhausted cursor holds its offset (the polling
                # steady-state), mid-batch or not
                break
            out.extend(_normalize_row(r, self.page_size) for r in rows)
            advanced += 1
        return iter(out), {"page": page + advanced}

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
    pages_per_batch: int = 10,
):
    """Run the streaming source over every available page and return the
    appended result as a batch DataFrame. With ``base_url`` the pages
    come from the live HTTP pager instead of the local transport
    (``path`` then only sizes the expected-row guard). This entry point
    is the CATCH-UP consumer (drain everything now), so it defaults to
    10 pages per micro-batch; the strict one-page poll cadence stays the
    reader default.

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
        .option("pages_per_batch", str(pages_per_batch))
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
