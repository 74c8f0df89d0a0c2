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

No network exists in this environment, so the transport is a deterministic
local "page server" over the documents table, read with pyarrow DIRECTLY
(deliberately not Spark's parquet reader — this code path stands where an
HTTP client would). Row normalization mirrors the reference's ingest dicts
(``REDDIT-Ingestion.py:124-133``: ``t3_`` ids, capped titles, score), so
the entire custom source is oracle-checkable. A real deployment swaps
``_fetch_page`` for the HTTP call; partition planning, rate budget per
page, schema, and normalization all stay.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

cloudpickle.register_pickle_by_value(sys.modules[__name__])

TITLE_CAP = 40
DEFAULT_PAGE_SIZE = 100


def _fetch_page(path: str, start: int, page_size: int) -> list[dict]:
    """The 'HTTP GET' stand-in: one page of raw posts. pyarrow reads the
    backing table and slices the page — a real source issues the paged
    API request here (with the reference's rate delay / backoff policy
    applied PER TASK, which is what makes the budget parallelizable)."""
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=["doc_id", "text", "n_chars"])
    return table.slice(start, page_size).to_pylist()


class QAApiReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.page_size = int(options.get("page_size", DEFAULT_PAGE_SIZE))

    def partitions(self) -> list[InputPartition]:
        """Page planning = the API's pagination, done from metadata only
        (row count from the parquet footer; an HTTP source would use the
        endpoint's advertised total/cursor)."""
        import pyarrow.parquet as pq

        n = pq.read_metadata(self.path).num_rows
        pages = max(1, -(-n // self.page_size))
        return [InputPartition(i) for i in range(pages)]

    def read(self, partition: InputPartition):
        start = partition.value * self.page_size
        for row in _fetch_page(self.path, start, self.page_size):
            text = row["text"] or ""
            # python slicing and SQL substr both count codepoints
            yield (
                f"t3_{row['doc_id']}",
                text[:TITLE_CAP],
                int(row["n_chars"]),
                int(row["doc_id"]) // self.page_size,
            )


class QAApiDataSource(DataSource):
    """``spark.read.format("qa_api").option("path", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "qa_api"

    def schema(self) -> str:
        return "id_post string, title string, score bigint, page int"

    def reader(self, schema) -> QAApiReader:
        return QAApiReader(self.options)


def register_qa_api(spark) -> None:
    """Idempotent registration of the qa_api format on a session."""
    try:
        spark.dataSource.register(QAApiDataSource)
    except Exception:
        pass  # already registered on this session
