"""Executor-side sinks for external stores (SURVEY.md §2.2 K3).

The reference rebuilds a Qdrant collection and bulk-upserts every vector
FROM THE DRIVER after collecting the whole corpus into pandas
(``/root/reference/PLATFORM-contextual-Chunking.py:132-176``) — a
single-process bottleneck that caps corpus size at driver memory. Here the
upsert runs inside ``foreachPartition``: every executor opens its own
client and streams its partition in bounded batches, so throughput scales
with the cluster and the driver never holds data.

The client is created by a zero-arg factory INSIDE the partition function
(connections/sockets don't survive pickling), and rows are buffered to at
most ``batch_size`` before each flush — constant executor memory however
large the partition.
"""

from __future__ import annotations

import sys
from typing import Any, Callable, Iterable, Iterator, Protocol

from pyspark import cloudpickle
from pyspark.sql import DataFrame

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class VectorClient(Protocol):
    """Minimal surface the sink needs — matches what the reference uses of
    the Qdrant client (``upsert`` at PLATFORM-contextual-Chunking.py:174)."""

    def upsert(self, batch: list[dict[str, Any]]) -> None: ...

    def close(self) -> None: ...


def upsert_vectors(
    df: DataFrame,
    make_client: Callable[[], VectorClient],
    id_col: str = "id",
    vector_col: str = "vector",
    payload_cols: Iterable[str] = (),
    batch_size: int = 500,
) -> None:
    """Distributed vector upsert: one client per partition, bounded batches.

    Point shape mirrors the reference's Qdrant points
    (``{id, vector, payload{...}}``, PLATFORM-contextual-Chunking.py:
    147-156); the store behind ``make_client`` is pluggable.
    """
    payload_cols = tuple(payload_cols)

    def run(rows: Iterator) -> None:
        client = make_client()
        try:
            batch: list[dict[str, Any]] = []
            for r in rows:
                batch.append(
                    {
                        "id": r[id_col],
                        "vector": list(r[vector_col]),
                        "payload": {c: r[c] for c in payload_cols},
                    }
                )
                if len(batch) >= batch_size:
                    client.upsert(batch)
                    batch = []
            if batch:
                client.upsert(batch)
        finally:
            close = getattr(client, "close", None)
            if close is not None:
                close()

    df.foreachPartition(run)
