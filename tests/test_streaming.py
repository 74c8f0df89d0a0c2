"""Streaming semantics the batch oracle can't check: watermark late-data
drops across micro-batches, and incremental stateful accumulation."""

from __future__ import annotations

import pyspark.sql.functions as F

from qa_data_pipeline_rag_llm_spark.schemas import TESTDATA_SCHEMAS
from qa_data_pipeline_rag_llm_spark.streaming.events import run_to_completion


def _write_batches(spark, tmp_path, batches):
    """Write each batch of (event_id, ts_ns, user_id, event_type, value,
    props) rows as its own parquet file so maxFilesPerTrigger=1 replays
    them as separate micro-batches, in name order."""
    import glob
    import os
    import shutil

    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["events"])
        df.coalesce(1).write.parquet(str(tmp_path / f"b{i}"))
        part = glob.glob(str(tmp_path / f"b{i}" / "part-*.parquet"))[0]
        dst = str(src / f"{i:04d}.parquet")
        shutil.copy(part, dst)
        # the file source orders batches by mtime — make it unambiguous
        os.utime(dst, (1_000_000 + i * 10, 1_000_000 + i * 10))
    return str(src)


def _evt(eid, hour, uid=1, typ="click", value=1.0):
    ns = hour * 3600 * 1_000_000_000
    return (eid, ns, uid, typ, value, "{}")


def test_watermark_drops_late_rows(spark, tmp_path):
    """Watermark guarantee: once a window is emitted+evicted (watermark past
    its end at a batch boundary), later rows for it are dropped — the
    window never reopens. (A late row arriving in the same batch as the
    eviction still merges: the watermark is a lower bound, not a filter.)"""
    batches = [
        [_evt(1, hour=0), _evt(2, hour=0), _evt(3, hour=10)],  # wm → 09:00
        [_evt(4, hour=0), _evt(5, hour=10)],  # merges, then hour-0 evicts
        [_evt(6, hour=0), _evt(7, hour=10)],  # hour-0 now DROPPED
        [_evt(8, hour=20)],  # advance wm so hour-10 also emits
    ]
    src = _write_batches(spark, tmp_path, batches)
    stream = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )
    res = run_to_completion(stream, "append")
    rows = res.collect()
    counts = {r["window"].start.hour: r["n"] for r in rows}
    assert len(rows) == len(counts), f"window re-emitted: {rows}"
    # 4 hour-0 events arrived; event 6 came after eviction → dropped
    assert counts[0] == 3, counts
    assert counts[10] == 3, counts


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState carries state between micro-batches."""
    from qa_data_pipeline_rag_llm_spark.streaming import events as ev

    batches = [
        [_evt(1, 0, uid=7, value=1.5), _evt(2, 1, uid=7, value=2.0)],
        [_evt(3, 2, uid=7, value=0.25)],
    ]
    src = _write_batches(spark, tmp_path, batches)
    raw = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = raw.groupBy("user_id").applyInPandasWithState(
        ev._update_user_totals,
        outputStructType=ev._OUT_SCHEMA,
        stateStructType=ev._STATE_SCHEMA,
        outputMode="update",
        timeoutConf=__import__(
            "pyspark.sql.streaming.state", fromlist=["GroupStateTimeout"]
        ).GroupStateTimeout.NoTimeout,
    )
    res = run_to_completion(out, "update").collect()
    per_batch = sorted((r["n_events"], r["total_scaled"]) for r in res)
    # batch 1: 2 events, 3.5 total; batch 2 carries state: 3 events, 3.75
    assert per_batch == [(2, 3_500_000), (3, 3_750_000)]


def test_stateful_last_event_survives_older_later_batch(spark, tmp_path):
    """The globally-latest event arrives in batch 1; batch 2 carries only
    OLDER events. last_event must come from STATE, not be recomputed from
    the current micro-batch (review r03: the pre-fix state carried only
    (n, total) and batch 2's emission — the one with max n_events —
    reported the stale type)."""
    import qa_data_pipeline_rag_llm_spark.streaming.events as ev
    from pyspark.sql.streaming.state import GroupStateTimeout

    batches = [
        [_evt(1, hour=5, typ="purchase"), _evt(2, hour=9, typ="view")],
        [_evt(3, hour=1, typ="click"), _evt(4, hour=2, typ="click")],
    ]
    src = _write_batches(spark, tmp_path, batches)
    raw = (
        spark.readStream.schema(TESTDATA_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = raw.groupBy("user_id").applyInPandasWithState(
        ev._update_user_totals,
        outputStructType=ev._OUT_SCHEMA,
        stateStructType=ev._STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    res = run_to_completion(out, "update").collect()
    final = max(res, key=lambda r: r["n_events"])
    assert final["n_events"] == 4
    assert final["last_event"] == "view"  # hour-9 event from batch 1


def test_type_profile_tws_and_fallback_paths_agree(spark):
    """Both implementations of the per-user type profile — the Spark 4
    transformWithStateInPandas primary and the applyInPandasWithState
    fallback — must emit identical final rows (VERDICT r03 #8).

    The r8/r9 gate (no protobuf wheel, no network to fetch one) is
    CLOSED in r10 by ``protobuf_compat.ensure_protobuf``: the container
    ships a pure-Python protobuf runtime inside the public
    google-cloud-sdk, and engine sessions export it to python workers
    before the JVM starts. This parity assertion is also the safety
    argument for running a 6.32 runtime under 6.33 gencode: the two
    implementations share no state plumbing, so a wire-format
    incompatibility in the tws state protocol cannot produce matching
    rows by accident. Skips only on a host with no runtime anywhere."""
    import pytest

    from qa_data_pipeline_rag_llm_spark.protobuf_compat import (
        ensure_protobuf,
    )

    if not ensure_protobuf():
        pytest.skip("no google.protobuf runtime anywhere on this host")

    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        stream_user_type_profile,
    )
    from tests.conftest import SF_DIR

    tws = sorted(
        map(tuple, stream_user_type_profile(spark, SF_DIR, impl="tws").collect())
    )
    fb = sorted(
        map(
            tuple,
            stream_user_type_profile(spark, SF_DIR, impl="fallback").collect(),
        )
    )
    assert tws == fb and len(tws) > 0


def test_file_stream_reads_directory_table_layout(spark, tmp_path):
    """The r10 sf1 sweep found pathGlobFilter matched ZERO leaf files
    when events.parquet is a Spark-written DIRECTORY — every file-source
    stream read an empty input at probe scale, vacuously green. Pin the
    directory branch: a directory-table stream must see every row the
    batch reader sees."""
    from qa_data_pipeline_rag_llm_spark.catalog import load_table
    from qa_data_pipeline_rag_llm_spark.streaming.events import (
        read_events_stream,
        run_to_completion,
    )
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    n_batch = ev.count()
    # write as a true directory table (multiple part files)
    ev.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    streamed = run_to_completion(
        read_events_stream(spark, str(tmp_path)).groupBy().count(),
        "complete",
    )
    assert streamed.collect()[0][0] == n_batch > 0
