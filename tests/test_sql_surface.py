"""The engine's SQL surface: the same tables registered as temp views must
answer Spark SQL with results identical to the DataFrame plans (SURVEY §7
design stance — one set of plans, two surfaces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import REGISTRY
from tests.conftest import SF_DIR


def test_spark_sql_matches_dataframe_plan(spark, tables):
    sql = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(round(l_quantity * 10000) AS BIGINT)) AS DOUBLE)
                 / 10000 AS sum_qty
        FROM lineitem GROUP BY l_returnflag
        """
    )
    df = (
        tables["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            (
                F.sum(F.round(F.col("l_quantity") * 10000).cast("long")).cast(
                    "double"
                )
                / 10000
            ).alias("sum_qty"),
        )
    )
    assert {tuple(r) for r in sql.collect()} == {tuple(r) for r in df.collect()}


def test_registry_plan_composes_with_sql(spark, tables):
    """A registry DataFrame result can re-enter the SQL surface as a view
    and join against the catalog views — plans compose across surfaces."""
    REGISTRY["dedup_exact_documents"].spark(spark, SF_DIR).createOrReplaceTempView(
        "dedup_groups"
    )
    out = spark.sql(
        """
        SELECT COUNT(*) AS n_docs, COUNT(DISTINCT g.fp) AS n_groups
        FROM documents d
        JOIN dedup_groups g ON g.keep_id = d.doc_id
        """
    ).first()
    assert out.n_groups <= out.n_docs
    assert out.n_groups == REGISTRY["dedup_exact_documents"].spark(spark, SF_DIR).count()
