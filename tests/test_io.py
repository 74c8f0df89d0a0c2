"""IO round-trips: distributed writers + explicit-schema CSV source."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from qa_data_pipeline_rag_llm_spark.io import read_csv, write_table
from qa_data_pipeline_rag_llm_spark.schemas import TESTDATA_SCHEMAS


def test_parquet_partitioned_roundtrip(spark, tables, tmp_path):
    """Partitioned parquet write → read back: identical rows, and partition
    pruning visible in the scan plan."""
    out = str(tmp_path / "orders_by_status")
    orders = tables["orders"]
    write_table(orders, out, partition_by=["o_orderstatus"], sort_by=["o_orderkey"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)
    # pruning: only one partition directory is scanned for an equality filter
    plan = back.filter(F.col("o_orderstatus") == "F")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_csv_dialect_roundtrip(spark, tmp_path):
    """The reference's CSV dialect (multiLine, quote-escaped quotes —
    REDDIT-Nettoyage-Posts.py:37-46) survives a write+read round-trip with
    embedded newlines and quotes, WITHOUT schema inference."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField("id", StringType()), StructField("body", StringType())]
    )
    rows = [
        ("a", 'line one\nline "two"'),
        ("b", "plain"),
        ("c", None),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "csv_roundtrip")
    write_table(df.repartition(1), out, fmt="csv")
    back = read_csv(spark, out, schema)
    got = {r["id"]: r["body"] for r in back.collect()}
    assert got == {"a": 'line one\nline "two"', "b": "plain", "c": None}


def test_arrays_stay_native_in_parquet(spark, tmp_path):
    """Arrays round-trip natively (no literal_eval hack — SURVEY.md §1.2)."""
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, [])], "id INT, comment_ids ARRAY<STRING>"
    )
    out = str(tmp_path / "native_arrays")
    write_table(df, out)
    back = spark.read.parquet(out).orderBy("id").collect()
    assert back[0]["comment_ids"] == ["x", "y"]
    assert back[1]["comment_ids"] == []


def test_events_schema_matches_catalog(tables):
    """events ns-int64 ts is typed to TimestampType by the catalog."""
    assert dict(tables["events"].dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("name", sorted(TESTDATA_SCHEMAS))
def test_declared_schemas_load(tables, name):
    assert tables[name].count() > 0


def test_bucketed_join_is_exchange_free(spark, tables):
    """Two tables bucketed by the join key into the same bucket count
    sort-merge-join with NO Exchange on either side — the write-once,
    join-many pattern for repeated fact-fact joins at scale."""
    from qa_data_pipeline_rag_llm_spark.io import write_bucketed

    write_bucketed(
        tables["orders"].select("o_orderkey", "o_totalprice"),
        "t_orders_bkt", ["o_orderkey"], 8, sort_by=["o_orderkey"],
    )
    write_bucketed(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        "t_lineitem_bkt", ["l_orderkey"], 8, sort_by=["l_orderkey"],
    )
    old = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    try:
        # forbid broadcast + freeze the plan so the assertion sees the
        # static sort-merge join, not an AQE rewrite
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        o = spark.table("t_orders_bkt")
        li = spark.table("t_lineitem_bkt")
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        expected = (
            tables["orders"]
            .join(tables["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_bkt")


def test_csv_permissive_corrupt_records(spark, tmp_path):
    """Malformed rows at 100 TB are a certainty, not an edge case: in
    PERMISSIVE mode bad rows land in the corrupt-record column instead of
    killing the job, and clean rows parse fully."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    path = str(tmp_path / "dirty.csv")
    with open(path, "w") as f:
        f.write("id,score\n1,10\nnot_an_int,zap\n3,30\n")
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("score", IntegerType()),
            StructField("_corrupt", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert {r["id"] for r in good.collect()} == {1, 3}
    assert "not_an_int" in bad.collect()[0]["_corrupt"]
    df.unpersist()


def test_observed_write_returns_metrics(spark, tables, tmp_path):
    """write_table_observed: one job writes AND returns audit counters —
    verified against independently computed aggregates."""
    from pyspark.sql import functions as F

    from qa_data_pipeline_rag_llm_spark.io import write_table_observed

    docs = tables["documents"]
    got = write_table_observed(
        docs,
        str(tmp_path / "obs_out"),
        metrics={
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.count(F.lit(1)) - F.count("text"),
            "total_chars": F.sum("n_chars"),
        },
    )
    expect = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("text")).alias("n_null_text"),
        F.sum("n_chars").alias("total_chars"),
    ).collect()[0]
    assert got["n_rows"] == expect.n_rows
    assert got["n_null_text"] == expect.n_null_text
    assert got["total_chars"] == expect.total_chars
    assert spark.read.parquet(str(tmp_path / "obs_out")).count() == expect.n_rows


def test_compact_small_files(spark, tables, tmp_path):
    """32 shuffled-out small files → 4; rows and content survive, file
    count actually drops."""
    import glob

    from qa_data_pipeline_rag_llm_spark.io import compact

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    docs = tables["documents"]
    docs.repartition(32).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 32
    n = compact(spark, src, dst, target_files=4, sort_by=["doc_id"])
    assert n == docs.count()
    assert 1 <= len(glob.glob(f"{dst}/part-*.parquet")) <= 4
    back = spark.read.parquet(dst)
    assert back.count() == n
    assert back.select("doc_id").subtract(docs.select("doc_id")).count() == 0


def test_vector_sink_writer_two_phase_commit(spark, tables, tmp_path):
    """K3 as a Python DataSourceWriter: staged files publish only through
    the manifest (two-phase commit), append accumulates, and a failing
    write publishes NOTHING."""
    import glob
    import json
    import os

    import pytest

    from qa_data_pipeline_rag_llm_spark.sinks import (
        make_vector_sink_datasource,
        read_vector_manifest,
    )

    spark.dataSource.register(make_vector_sink_datasource())
    dest = str(tmp_path / "collection")
    emb = tables["embeddings"].select("vec_id", "embedding").limit(50)
    emb.write.format("qa_vector").option("path", dest).mode("overwrite").save()

    manifest = read_vector_manifest(dest)
    assert manifest["n_total"] == 50
    staged = {os.path.basename(p) for p in glob.glob(f"{dest}/_staged-*.jsonl")}
    assert {f["file"] for f in manifest["files"]} == staged
    rows = [
        json.loads(line)
        for f in manifest["files"]
        for line in open(os.path.join(dest, f["file"]))
    ]
    assert len(rows) == 50 and all(len(r["embedding"]) == 64 for r in rows)

    # append mode extends the manifest
    emb.write.format("qa_vector").option("path", dest).mode("append").save()
    assert read_vector_manifest(dest)["n_total"] == 100

    # a poisoned job must abort without publishing anything new
    from pyspark.sql import functions as F

    bad = emb.select(
        F.udf(lambda _: (_ for _ in ()).throw(RuntimeError("boom")))(
            "vec_id"
        ).alias("vec_id"),
        "embedding",
    )
    with pytest.raises(Exception):
        bad.write.format("qa_vector").option("path", dest).mode("append").save()
    assert read_vector_manifest(dest)["n_total"] == 100


def test_vector_sink_stream_writer_exactly_once(spark, tmp_path):
    """Streaming writes land through per-batch manifest commits; a
    replayed batchId is dropped so totals never double-count."""
    import json
    import os

    from qa_data_pipeline_rag_llm_spark.sinks import (
        make_vector_sink_datasource,
        read_vector_manifest,
    )
    from qa_data_pipeline_rag_llm_spark.sources.pyapi import register_qa_api

    spark.dataSource.register(make_vector_sink_datasource())
    register_qa_api(spark)
    dest = str(tmp_path / "stream_collection")

    # qa_api streaming source → qa_vector streaming sink, page by page
    df = (
        spark.readStream.format("qa_api")
        .option("path", f"{os.environ.get('SPARK_GRAFT_TEST_SF_DIR', '/root/testdata/sf0.001')}/documents.parquet")
        .option("page_size", "50")
        .load()
    )
    import time

    import pyarrow.parquet as pq

    src_path = f"{os.environ.get('SPARK_GRAFT_TEST_SF_DIR', '/root/testdata/sf0.001')}/documents.parquet"
    expected = pq.read_metadata(src_path).num_rows
    q = (
        df.writeStream.format("qa_vector")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if read_vector_manifest(dest)["n_total"] >= expected:
                    break
            except FileNotFoundError:
                pass
            time.sleep(0.2)
    finally:
        q.stop()

    manifest = read_vector_manifest(dest)
    assert manifest["n_total"] == expected
    assert len(manifest["batches"]) == len(set(manifest["batches"]))
    ids = [
        json.loads(line)["id_post"]
        for f in manifest["files"]
        for line in open(os.path.join(dest, f["file"]))
    ]
    assert len(ids) == len(set(ids)) == expected
