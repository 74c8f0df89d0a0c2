"""Domain-shaped E2E pipeline test (FIXTURES.md): raw ingest shapes through
clean → rank → join → union, against hand-computed goldens.

Covers the reference-behavior edge cases SURVEY.md §5 pins:
  * P3 NOT-IN drops NULL bodies too (NULL-unsafe ~isin, pinned semantics)
  * P4 bot-regex anti-filter keeps NULL-safe rows
  * W1 tie-break: equal scores ordered by id_comment
  * k cutoff per parent; left-join NULL arm; orphan comments dropped by join
  * Stack int ids unified to string; HTML stripped; F1 null-safety
  * union by NAME with platform-asymmetric columns
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qa_data_pipeline_rag_llm_spark.operators.joins import enrich_with_child_ids
from qa_data_pipeline_rag_llm_spark.operators.merge import union_corpus
from qa_data_pipeline_rag_llm_spark.operators.normalize import (
    normalize_reddit_comments,
    normalize_reddit_posts,
    normalize_stack_answers,
    normalize_stack_questions,
)
from qa_data_pipeline_rag_llm_spark.operators.ranking import top_k_per_group
from qa_data_pipeline_rag_llm_spark.schemas import (
    REDDIT_COMMENTS,
    REDDIT_POSTS,
    STACK_ANSWERS,
    STACK_QUESTIONS,
)

K = 2  # small top-k so the cutoff is exercised with a tiny fixture


@pytest.fixture(scope="module")
def corpus(spark):
    posts = spark.createDataFrame(
        [
            ("Reddit", "askhist", "abc1", "How?", "body text", 5, 1.6e9, "u1"),
            ("Reddit", "askhist", "abc2", "Why?", "more text", 3, 1.6e9, "u2"),
            ("Reddit", "spark", "abc3", "What?", "no comments here", 9, 1.6e9, "u3"),
        ],
        REDDIT_POSTS,
    )
    comments = spark.createDataFrame(
        [
            ("c1", "[deleted]", 50, 1.6e9, "abc1"),       # P3 drop
            ("c2", None, 50, 1.6e9, "abc1"),              # P3 drops NULL too
            ("c3", "I'm a bot, beep", 40, 1.6e9, "abc1"),  # P4 drop
            ("c4", "good answer", 7, 1.6e9, "abc1"),
            ("c5", "tie A", 7, 1.6e9, "abc1"),            # tie with c4 on score
            ("c6", "third", 1, 1.6e9, "abc1"),            # rank 3 > K: cut
            ("c7", "orphan", 9, 1.6e9, "zzz"),            # orphan parent
            ("c8", "on second", 2, 1.6e9, "abc2"),
        ],
        REDDIT_COMMENTS,
    )
    questions = spark.createDataFrame(
        [
            (
                "StackExchange", "so", 101,
                "Spark &amp; SQL", "<p>html <b>body</b></p>", 12, 2, 1_600_000_000,
                1_600_000_001, "s1",
            ),
            ("StackExchange", "so", 102, "Plain", None, 4, 0, 1_600_000_000,
             1_600_000_001, "s2"),  # NULL body: F1 null-safe
        ],
        STACK_QUESTIONS,
    )
    answers = spark.createDataFrame(
        [
            (201, "<p>answer &lt;one&gt;</p>", 9, 1_600_000_000, True, 101, 10, "u"),
            (202, "[removed]", 99, 1_600_000_000, False, 101, 10, "u"),  # P3
            (203, "plain answer", 9, 1_600_000_000, False, 101, 10, "u"),  # tie
            (204, "low", 1, 1_600_000_000, False, 101, 10, "u"),  # cut by K
        ],
        STACK_ANSWERS,
    )
    r_posts = normalize_reddit_posts(posts)
    r_comms = top_k_per_group(
        normalize_reddit_comments(comments),
        group_by=["parent_post_id"],
        order_by=[F.desc("score"), F.col("id_comment")],
        k=K,
    )
    s_posts = normalize_stack_questions(questions)
    s_comms = top_k_per_group(
        normalize_stack_answers(answers),
        group_by=["parent_post_id"],
        order_by=[F.desc("score"), F.col("id_comment")],
        k=K,
    )
    r_infos = enrich_with_child_ids(
        r_posts, r_comms, "id_post", "parent_post_id", "id_comment"
    )
    s_infos = enrich_with_child_ids(
        s_posts, s_comms, "id_post", "parent_post_id", "id_comment"
    )
    merged = union_corpus(r_infos, s_infos)
    return {r["id_post"]: r.asDict() for r in merged.collect()}


def test_row_count_and_union_by_name(corpus):
    assert set(corpus) == {"abc1", "abc2", "abc3", "101", "102"}


def test_filters_tiebreak_and_cutoff(corpus):
    # c1 deleted, c2 NULL, c3 bot → survivors c4(7), c5(7), c6(1);
    # tie c4/c5 broken by id; k=2 cuts c6
    assert corpus["abc1"]["comment_ids"] == ["c4", "c5"]


def test_left_join_null_arm_and_orphans(corpus):
    assert corpus["abc3"]["comment_ids"] is None  # no comments
    assert corpus["abc2"]["comment_ids"] == ["c8"]
    assert not any(
        c and "c7" in c for c in (r["comment_ids"] for r in corpus.values())
    )  # orphan never joined


def test_stack_ids_unified_and_html_stripped(corpus):
    q = corpus["101"]
    assert q["title"] == "Spark & SQL"
    assert q["body"] == "html body"
    # 202 removed; tie 201/203 on score 9 → id order; k=2 keeps both
    assert q["comment_ids"] == ["201", "203"]
    assert corpus["102"]["body"] is None  # F1 null-safe (reference's comment
    # variant would crash — STACK-Nettoyage-Comms.py:75-81)


def test_dates_typed(corpus):
    import datetime

    assert isinstance(corpus["abc1"]["date"], datetime.datetime)
    assert isinstance(corpus["101"]["date"], datetime.datetime)
