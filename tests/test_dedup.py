"""Dedup operator correctness beyond the oracle compare: approximate methods
judged against the exact n-gram-Jaccard ground truth (SURVEY.md §5 model)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from user_behavior_spark_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def true_pairs(docs):
    return set(
        map(
            tuple,
            ngram_jaccard_pairs(docs, n=3, threshold=0.5)
            .select("doc_id_1", "doc_id_2")
            .toPandas()
            .values,
        )
    )


def test_minhash_lsh_equals_exact(docs, true_pairs):
    """LSH candidates + exact verification must reproduce the exact pair set
    (recall at j>=0.5 with 32 bands is 1-1e-23)."""
    lsh = set(
        map(
            tuple,
            minhash_lsh_pairs(docs, n=3, threshold=0.5)
            .select("doc_id_1", "doc_id_2")
            .toPandas()
            .values,
        )
    )
    assert lsh == true_pairs


def test_simhash_strict_threshold_is_precise(docs, true_pairs):
    """Hamming <= 2 pairs are all true near-dups (no false positives at the
    strict threshold on this corpus — calibrated: noise floor starts at 3)."""
    strict = simhash_near_pairs(docs, max_hamming=2).toPandas()
    for a, b in zip(strict.doc_id_1, strict.doc_id_2):
        assert (a, b) in true_pairs


def test_simhash_default_threshold_recall(docs, true_pairs):
    """Hamming <= 4 recovers the majority of planted near-dup pairs."""
    found = set(
        map(
            tuple,
            simhash_near_pairs(docs, max_hamming=4)
            .select("doc_id_1", "doc_id_2")
            .toPandas()
            .values,
        )
    )
    recall = len(found & true_pairs) / len(true_pairs)
    assert recall >= 0.6, f"simhash recall {recall:.2f}"


def test_exact_dedup_counts_planted_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")],
        "doc_id long, text string",
    )
    out = {
        r["min_doc_id"]: r["n_copies"] for r in exact_duplicates(df).collect()
    }
    assert out == {1: 3, 2: 1, 5: 1}
