"""Registry entry: higher-order array functions (lambda expressions).

transform / filter / aggregate / exists / zip_with run INSIDE codegen on
array columns — the fast path for per-row array work that the reference
would have done in Python (its list flatten F7, float casts F8). The
vector ops in functions/vectors.py are built from the same primitives;
this query pins the lambda semantics themselves against DuckDB's
list_* twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.plans.queries import _t, register


@register(
    "hof_token_metrics",
    """
    SELECT doc_id,
           len(toks) AS n_toks,
           CAST(list_reduce(list_prepend(0, list_transform(toks, x -> length(x) * length(x))),
                            (a, b) -> a + b) AS BIGINT) AS sum_sq_len,
           len(list_filter(toks, x -> length(x) >= 6)) AS n_long,
           CAST(list_has_any(toks, ['the', 'and']) AS BOOLEAN) AS has_stopword,
           COALESCE(array_to_string(list_transform(list_sort(list_filter(toks, x -> length(x) >= 8)),
                                                   x -> upper(x)), ','), '') AS long_upper
    FROM (SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents)
    """,
    doc="Higher-order lambdas on arrays, all codegen-side: transform "
    "(square of token length), aggregate/reduce (their sum), filter + "
    "size, exists (stopword), and a sort+transform chain whose FINAL "
    "projection is stringified via array_join (driver output contract — "
    "no ArrayType in result schemas). Zero Python, "
    "zero shuffle. Tokens here are deliberately RAW lowered space-splits "
    "(punctuation kept — the point is the lambda surface, not text "
    "canon); caveat: raw lower() before split means Unicode special-"
    "casing letters (U+0130 İ) could yield engine-divergent token "
    "strings — unlike the normalize_text family, which strips first "
    "(tests/test_fragment_parity.py). Acceptable because the metrics "
    "here are length-based and the corpus contract is ASCII text.",
)
def hof_token_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != F.lit(""))
    t = d.select("doc_id", toks.alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.aggregate(
            F.transform("toks", lambda x: F.length(x) * F.length(x)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_sq_len"),
        F.size(F.filter("toks", lambda x: F.length(x) >= 6)).alias("n_long"),
        F.exists("toks", lambda x: x.isin("the", "and")).alias("has_stopword"),
        F.array_join(
            F.transform(
                F.array_sort(F.filter("toks", lambda x: F.length(x) >= 8)),
                lambda x: F.upper(x),
            ),
            ",",
        ).alias("long_upper"),
    )
