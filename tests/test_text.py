"""Text-analysis operators on hand-built fixtures (the oracle compare covers
the corpus; these pin edge semantics)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.text import (
    fingerprints,
    language_id,
    quality_scores,
    token_stats,
)


@pytest.fixture(scope="module")
def snippets(spark):
    rows = [
        (1, "the cat and the dog of a house", "en"),
        (2, "el perro de la casa que ladra", "es"),
        (3, "der hund und die katze das haus", "de"),
        (4, "le chien et les chats une maison", "fr"),
        (5, "你好世界", "zh"),
        (6, "zzz qqq xxx", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_language_id(snippets):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(snippets).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh", 6: "und"}


def test_token_stats(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox", "en")], "doc_id long, text string, lang string"
    )
    row = token_stats(df).collect()[0]
    assert row["n_tokens"] == 4
    assert row["tokens_est"] == 5  # ceil(19/4)
    assert row["stop_ratio_x1000"] == 250  # 1 stopword of 4


def test_quality_scores_punctuation(spark):
    df = spark.createDataFrame(
        [(1, "a b, c!", "en")], "doc_id long, text string, lang string"
    )
    row = quality_scores(df).collect()[0]
    assert row["n_chars"] == 7
    assert row["n_tokens"] == 3
    assert row["punct_ratio_x1000"] == 286  # 2 punct chars / 7
    assert row["alpha_ratio_x1000"] == 429  # 3 letters / 7


def test_fingerprint_ignores_case_and_punct(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!", "en"), (2, "hello world", "en"), (3, "different", "en")],
        "doc_id long, text string, lang string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in fingerprints(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_quality_scores_survive_multi_megabyte_document(spark):
    """length() is int32; the x1000 ratio math must widen to long first —
    a 3M-char document overflowed alpha*1000 (ANSI throw / silent wrap)."""
    from user_behavior_spark_pipeline_spark.operators.text import (
        quality_scores,
    )

    docs = spark.createDataFrame(
        [(1, "ab " * 1_000_000, "s")], "doc_id long, text string, source string"
    )
    r = quality_scores(docs).collect()[0]
    assert r["n_chars"] == 3_000_000
    assert 0 <= r["alpha_ratio_x1000"] <= 1000
