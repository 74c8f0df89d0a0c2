"""qa_data_pipeline_rag_llm_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``Ibral100/QA-Data-Pipeline-RAG-LLM``
(an end-to-end QA/RAG corpus pipeline: ingest → clean → rank → join → merge
→ embed → cluster → retrieve), extended with the operators a large-scale
training-data pipeline needs (dedup families, similarity search, text
analytics, streaming ingest, multimodal column plumbing).

Design stance (see SURVEY.md §7):
  * DataFrame/SQL plans only — Catalyst + Tungsten pick physical strategy.
  * Explicit schemas, Parquet-native arrays, no driver-side collects.
  * Every deterministic operator is oracle-checkable against DuckDB.
  * Partitioning/broadcast/AQE choices made for 100 TB, verified at sf0.1.
"""

__version__ = "0.1.0"

from qa_data_pipeline_rag_llm_spark.session import get_spark  # noqa: F401
