from qa_data_pipeline_rag_llm_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_to_completion,
    stream_hourly_counts,
    stream_user_running_totals,
)
