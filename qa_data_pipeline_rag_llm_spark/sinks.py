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
from pyspark.sql.datasource import WriterCommitMessage

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class VectorClient(Protocol):
    """Minimal surface the sink needs — matches what the reference uses of
    the Qdrant client (``upsert`` at PLATFORM-contextual-Chunking.py:174)."""

    def upsert(self, batch: list[dict[str, Any]]) -> None: ...

    def close(self) -> None: ...


class _VectorCommit(WriterCommitMessage):
    """Per-task commit message: which staged file holds how many points."""

    def __init__(self, filename: str, n: int) -> None:
        self.filename = filename
        self.n = n


def make_vector_sink_datasource():
    """Spark 4 Python Data Source WRITER for the vector collection (K3):
    ``df.write.format("qa_vector").option("path", dir).mode(...).save()``.

    Where :func:`upsert_vectors` streams to a live store, this writer is
    the TABLE-shaped version with a real two-phase commit — the property
    the reference's driver-side rebuild-then-upsert loop lacks entirely
    (a crash there leaves the collection half-rebuilt,
    ``PLATFORM-contextual-Chunking.py:132-176``):

      * each task stages its partition to ``_staged-<uuid>.jsonl`` and
        returns a commit message (file, row count);
      * ``commit`` writes ``_MANIFEST.json`` listing exactly the staged
        files — readers resolve the collection THROUGH the manifest, so
        a job that dies mid-write publishes nothing;
      * ``abort`` deletes the orphaned staging files.

    Built lazily inside a function because declaring a DataSource
    subclass imports Spark session machinery.
    """
    from pyspark.sql.datasource import DataSource, DataSourceWriter

    class QAVectorWriter(DataSourceWriter):
        def __init__(self, options: dict, overwrite: bool) -> None:
            self.path = options["path"]
            self.overwrite = overwrite

        def write(self, iterator):
            import json
            import os
            import uuid

            os.makedirs(self.path, exist_ok=True)
            fname = f"_staged-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, fname), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(recursive=True)) + "\n")
                    n += 1
            return _VectorCommit(fname, n)

        def commit(self, messages) -> None:
            import json
            import os

            manifest_path = os.path.join(self.path, "_MANIFEST.json")
            files = []
            state: dict = {}
            if not self.overwrite and os.path.exists(manifest_path):
                state = json.load(open(manifest_path))
                files = state["files"]
            files += [
                {"file": m.filename, "n": m.n} for m in messages if m is not None
            ]
            out = {"files": files, "n_total": sum(x["n"] for x in files)}
            # a batch append to a collection a STREAM also writes must not
            # drop the stream's replay ledger — losing 'batches' would let
            # a checkpoint-recovered micro-batch double-commit its rows
            if "batches" in state:
                out["batches"] = state["batches"]
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(out, f)
            os.replace(tmp, manifest_path)  # atomic publish
            if self.overwrite:
                # stale staged files from prior manifests are unreachable
                # through the new manifest; remove them so readers that
                # (incorrectly) glob the directory can't resurrect them
                keep = {x["file"] for x in files}
                for fn in os.listdir(self.path):
                    if fn.startswith("_staged-") and fn not in keep:
                        try:
                            os.remove(os.path.join(self.path, fn))
                        except OSError:
                            pass

        def abort(self, messages) -> None:
            import os

            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    from pyspark.sql.datasource import DataSourceStreamWriter

    class QAVectorStreamWriter(DataSourceStreamWriter):
        """Streaming variant: per-micro-batch manifest commits keyed by
        batchId, IDEMPOTENT on replay — Structured Streaming re-runs a
        batch after driver failure, and a sink that appends blindly
        double-counts it. A batchId already present in the manifest is
        dropped (its prior staged files win), which together with the
        source's replayable offsets gives end-to-end exactly-once."""

        def __init__(self, options: dict) -> None:
            self.path = options["path"]

        def write(self, iterator):
            return QAVectorWriter(
                {"path": self.path}, overwrite=False
            ).write(iterator)

        def commit(self, messages, batchId: int) -> None:
            import json
            import os

            manifest_path = os.path.join(self.path, "_MANIFEST.json")
            state = {"files": [], "batches": []}
            if os.path.exists(manifest_path):
                state = json.load(open(manifest_path))
                state.setdefault("batches", [])
            if batchId in state["batches"]:  # replayed batch: keep original
                for m in messages:
                    if m is not None:
                        try:
                            os.remove(os.path.join(self.path, m.filename))
                        except OSError:
                            pass
                return
            state["files"] += [
                {"file": m.filename, "n": m.n, "batch": batchId}
                for m in messages
                if m is not None
            ]
            state["batches"].append(batchId)
            state["n_total"] = sum(x["n"] for x in state["files"])
            tmp = manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, manifest_path)

        def abort(self, messages, batchId: int) -> None:
            import os

            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.filename))
                    except OSError:
                        pass

    class QAVectorDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "qa_vector"

        def writer(self, schema, overwrite: bool) -> QAVectorWriter:
            return QAVectorWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite: bool) -> QAVectorStreamWriter:
            return QAVectorStreamWriter(self.options)

    return QAVectorDataSource


def read_vector_manifest(path: str) -> dict:
    """Resolve a qa_vector collection through its manifest (the ONLY
    correct entry point — staged files not listed there are uncommitted)."""
    import json
    import os

    return json.load(open(os.path.join(path, "_MANIFEST.json")))


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
