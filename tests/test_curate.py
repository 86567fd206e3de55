"""Curation pipeline invariants — properties that must hold for ANY corpus,
checked on the fixture (the oracle compare pins exact values; these pin the
semantics a number-match alone wouldn't)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.curate import curate_corpus
from user_behavior_spark_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from user_behavior_spark_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def curated(spark, docs):
    return curate_corpus(docs).cache()


def test_curated_meets_quality_floor(curated):
    assert curated.filter("n_tokens < 20").count() == 0
    assert curated.count() > 0


def test_curated_has_no_exact_duplicates(docs, curated):
    kept = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    assert kept.count() == kept.select("text").distinct().count()


def test_curated_has_no_near_dup_pairs(docs, curated):
    """After greedy removal, no surviving pair may clear the threshold."""
    kept = docs.join(curated.select("doc_id"), "doc_id", "left_semi")
    assert ngram_jaccard_pairs(kept, n=3, threshold=0.5).count() == 0


def test_curated_is_subset_of_input(docs, curated):
    orphans = curated.join(docs.select("doc_id"), "doc_id", "left_anti")
    assert orphans.count() == 0
