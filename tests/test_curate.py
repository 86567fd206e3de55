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


def test_quality_filter_matches_score_semijoin(docs):
    """quality_filter (the in-row gate curate_corpus now applies) must keep
    EXACTLY the rows the old score-then-semi-join form kept, for the same
    thresholds — the r15 join-removal is a plan change, not a policy change."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.text import (
        quality_filter,
        quality_scores,
    )

    q = quality_scores(docs).filter(
        (F.col("n_tokens") >= 20) & (F.col("alpha_ratio_x1000") >= 800)
    )
    old = docs.join(q.select("doc_id"), "doc_id", "left_semi")
    new = quality_filter(docs, 20, 800)
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_jaccard_pair_properties_on_random_corpora(spark):
    """Property check (Hypothesis-seeded corpora, batched into one Spark
    pass per example set): for ANY small corpus, n-gram Jaccard pairs must
    be (a) canonically ordered doc_id_1 < doc_id_2, (b) within [threshold,
    1e6], and (c) EXACTLY 1e6 for identical texts with >= n tokens."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from user_behavior_spark_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon"])
    doc = st.lists(word, min_size=3, max_size=12).map(" ".join)

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=2, max_size=6))
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        # plant one exact duplicate so property (c) always has a witness
        rows.append((len(texts), texts[0]))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
        planted = (0, len(texts))
        seen_planted = False
        for r in pairs:
            assert r["doc_id_1"] < r["doc_id_2"]
            assert 500_000 <= r["jaccard_x1e6"] <= 1_000_000
            if (r["doc_id_1"], r["doc_id_2"]) == planted:
                seen_planted = True
                assert r["jaccard_x1e6"] == 1_000_000
        assert seen_planted

    check()
