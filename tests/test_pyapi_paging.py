"""Paging-layer parity for the qa_api source's r11 rewrite.

r11 replaced the local transport's read-everything-slice-one-page fetch
(O(n²/page) aggregate across tasks — the dominant term of the honest
sf1 cost in SCALING.md) with a footer-pruned slab index + single-slab
cache, and moved the batch reader onto Spark 4's Arrow RecordBatch
path with vectorized normalization. Neither change may move a byte of
output, so this file pins:

  * ``_fetch_page`` == the naive full-read-then-slice it replaced, on a
    single parquet file AND a Spark-written multi-file directory table,
    across page boundaries, row-group boundaries, and past-end reads;
  * ``_normalize_batches`` (vectorized, Arrow) == ``_normalize_row``
    (the streaming reader's per-row path), including null text and
    multibyte codepoints around the TITLE_CAP boundary;
  * the streaming reader's ``pages_per_batch`` catch-up mode appends
    the same rows in the same order as the strict one-page cadence and
    honors the exhausted-cursor offset contract mid-batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from qa_data_pipeline_rag_llm_spark.sources.pyapi import (
    TITLE_CAP,
    PAGE_COLUMNS,
    QAApiStreamReader,
    _fetch_page,
    _normalize_batches,
    _normalize_row,
)
from tests.conftest import SF_DIR

DOCS = f"{SF_DIR}/documents.parquet"


def _naive_fetch(path: str, start: int, page_size: int) -> list[dict]:
    # the pre-r11 implementation, verbatim: whole-table read + slice
    table = pq.read_table(path, columns=PAGE_COLUMNS)
    return table.slice(start, page_size).to_pylist()


def _assert_paging_parity(path: str, n_rows: int) -> None:
    for page_size in (1, 37, 100, n_rows + 5):
        pages = -(-n_rows // page_size) + 1  # one past the end
        for p in range(pages):
            got = _fetch_page(path, p * page_size, page_size)
            want = _naive_fetch(path, p * page_size, page_size)
            assert got == want, (path, page_size, p)


def test_fetch_page_matches_naive_single_file():
    n = pq.read_metadata(DOCS).num_rows
    _assert_paging_parity(DOCS, n)


def test_fetch_page_matches_naive_on_row_group_boundaries(tmp_path):
    """Small row groups force pages to straddle slab boundaries."""
    src = pq.read_table(DOCS, columns=PAGE_COLUMNS)
    path = str(tmp_path / "rg.parquet")
    pq.write_table(src, path, row_group_size=17)
    assert pq.read_metadata(path).num_row_groups > 1
    _assert_paging_parity(path, src.num_rows)


def test_fetch_page_matches_naive_directory_table(spark, tmp_path):
    """Spark-written directory layout: multiple part files, '_SUCCESS'
    sidecar — slab order must equal pq.read_table's dataset order."""
    path = str(tmp_path / "docs_dir")
    (
        spark.read.parquet(DOCS)
        .select(*PAGE_COLUMNS)
        .repartition(4)
        .write.mode("overwrite")
        .parquet(path)
    )
    n = sum(
        pq.read_metadata(f).num_rows
        for f in __import__("glob").glob(f"{path}/*.parquet")
    )
    assert n > 0
    _assert_paging_parity(path, n)


def test_vectorized_normalize_matches_row_path():
    over_cap = "é" * (TITLE_CAP + 3)  # multibyte, past the title cap
    t = pa.table(
        {
            "doc_id": pa.array([0, 7, 199, 200, 12345], pa.int64()),
            "text": pa.array(
                ["plain", None, "", over_cap, "naïve • ünïcode"],
                pa.string(),
            ),
            "n_chars": pa.array([5, 0, 0, len(over_cap), 15], pa.int64()),
        }
    )
    for page_size in (100, 37):
        got = [
            tuple(r.values())
            for b in _normalize_batches(t, page_size)
            for r in b.to_pylist()
        ]
        want = [_normalize_row(r, page_size) for r in t.to_pylist()]
        assert got == want
    # and the multibyte title really was capped at codepoints, not bytes
    assert got[3][1] == "é" * TITLE_CAP


def test_stream_catchup_mode_matches_strict_cadence():
    strict = QAApiStreamReader({"path": DOCS, "page_size": "37"})
    catchup = QAApiStreamReader(
        {"path": DOCS, "page_size": "37", "pages_per_batch": "4"}
    )
    rows_strict: list = []
    off = strict.initialOffset()
    while True:
        it, nxt = strict.read(off)
        rows_strict.extend(it)
        if nxt == off:
            break
        off = nxt
    rows_catchup: list = []
    off = catchup.initialOffset()
    batches = 0
    while True:
        it, nxt = catchup.read(off)
        rows_catchup.extend(it)
        batches += 1
        if nxt == off:
            break
        off = nxt
    assert rows_catchup == rows_strict
    n_pages = -(-len(rows_strict) // 37)
    assert batches < n_pages  # it actually batched pages up
    # exhausted cursor holds its offset mid-batch (the polling
    # steady-state): one more read returns nothing and the same offset
    it, nxt = catchup.read(off)
    assert list(it) == [] and nxt == off


def test_stream_offsets_advance_by_pages_consumed():
    r = QAApiStreamReader(
        {"path": DOCS, "page_size": "37", "pages_per_batch": "3"}
    )
    it, off = r.read(r.initialOffset())
    assert off == {"page": 3} and len(list(it)) == 3 * 37
    # replay of the committed range is bit-identical (recovery contract)
    replay = list(r.readBetweenOffsets(r.initialOffset(), off))
    it2, _ = QAApiStreamReader(
        {"path": DOCS, "page_size": "37", "pages_per_batch": "3"}
    ).read({"page": 0})
    assert replay == list(it2)


def test_rewritten_table_never_serves_stale_pages(tmp_path):
    """Review r11: the slab cache keys on the freshness token, so a
    table REWRITTEN at the same path (single file, or one part file of
    a directory table rewritten in place — where the directory's own
    mtime does not change) must serve the new bytes immediately."""
    import os

    path = str(tmp_path / "t.parquet")

    def write(vals):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(vals, pa.int64()),
                    "text": pa.array([f"d{v}" for v in vals], pa.string()),
                    "n_chars": pa.array([2] * len(vals), pa.int64()),
                }
            ),
            path,
        )

    write([1, 2, 3])
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10)] == [1, 2, 3]
    write([7, 8])
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10)] == [7, 8]

    # directory table: rewrite ONE part file in place, pin the dir mtime
    dpath = str(tmp_path / "dir_t")
    os.makedirs(dpath)
    part = os.path.join(dpath, "part-0.parquet")

    def write_part(vals):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(vals, pa.int64()),
                    "text": pa.array([f"d{v}" for v in vals], pa.string()),
                    "n_chars": pa.array([2] * len(vals), pa.int64()),
                }
            ),
            part,
        )

    write_part([10, 11])
    dir_stat = os.stat(dpath)
    assert [r["doc_id"] for r in _fetch_page(dpath, 0, 10)] == [10, 11]
    write_part([20, 21, 22])
    os.utime(dpath, ns=(dir_stat.st_atime_ns, dir_stat.st_mtime_ns))
    assert [r["doc_id"] for r in _fetch_page(dpath, 0, 10)] == [20, 21, 22]

    # NESTED layout (review r11): pads.dataset discovers fragments in
    # subdirectories, so the freshness token must walk recursively — a
    # top-level scan would return a constant token and pin stale bytes
    npath = str(tmp_path / "nested_t")
    sub = os.path.join(npath, "sub")
    os.makedirs(sub)
    part = os.path.join(sub, "part-0.parquet")
    write_part([30, 31])
    assert [r["doc_id"] for r in _fetch_page(npath, 0, 10)] == [30, 31]
    write_part([40])
    for p in (npath, sub):
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert [r["doc_id"] for r in _fetch_page(npath, 0, 10)] == [40]


def test_freshness_ttl_amortizes_but_default_stays_strict(tmp_path):
    """ADVICE r11: the recursive freshness walk is O(files) per page
    fetch. freshness_ttl_ms memoizes the token per process: within the
    TTL a rewrite may serve the old bytes (documented trade), and after
    the TTL the new bytes must appear; with the default ttl=0 the
    rewrite is visible on the very next fetch (the review-r11 pin)."""
    import time

    from qa_data_pipeline_rag_llm_spark.sources.pyapi import (
        _TOKEN_MEMO,
        _fetch_page,
    )

    path = str(tmp_path / "t.parquet")

    def write(vals):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(vals, pa.int64()),
                    "text": pa.array([f"d{v}" for v in vals], pa.string()),
                    "n_chars": pa.array([2] * len(vals), pa.int64()),
                }
            ),
            path,
        )

    write([1, 2])
    ttl_ns = 300_000_000  # 300 ms
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10, ttl_ns)] == [1, 2]
    assert path in _TOKEN_MEMO  # memo populated only on the TTL path
    write([5, 6, 7])
    # within the TTL the memoized token pins the old index / slab
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10, ttl_ns)] == [1, 2]
    # ...but a strict (default) fetch of the same path sees fresh bytes
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10)] == [5, 6, 7]
    # and after the TTL expires the amortized path converges too
    time.sleep(0.35)
    assert [r["doc_id"] for r in _fetch_page(path, 0, 10, ttl_ns)] == [5, 6, 7]
