"""Similarity-search paths: pandas_udf == JVM brute force (exact), LSH
recall against the exact baseline (approximate, calibrated)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
    pandas_cosine_topk,
)
from user_behavior_spark_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_topk(emb):
    return set(
        map(tuple, brute_force_topk(emb).select("query_id", "neighbor_id").toPandas().values)
    )


def test_pandas_udf_path_matches_jvm_path(emb, exact_topk):
    pandas_pairs = set(
        map(
            tuple,
            pandas_cosine_topk(emb).select("query_id", "neighbor_id").toPandas().values,
        )
    )
    assert pandas_pairs == exact_topk


def test_lsh_recall(emb, exact_topk):
    lsh = set(
        map(
            tuple,
            lsh_bucketed_topk(emb).select("query_id", "neighbor_id").toPandas().values,
        )
    )
    recall = len(lsh & exact_topk) / len(exact_topk)
    assert recall >= 0.5, f"LSH recall {recall:.2f}"


def test_topk_is_k_per_query(emb):
    df = brute_force_topk(emb, num_queries=3, k=4).toPandas()
    assert len(df) == 12
    assert set(df.groupby("query_id")["rank"].max()) == {4}


def test_ivf_recall(emb, exact_topk):
    from user_behavior_spark_pipeline_spark.operators.similarity import ivf_topk

    ivf = set(
        map(
            tuple,
            ivf_topk(emb).select("query_id", "neighbor_id").toPandas().values,
        )
    )
    recall = len(ivf & exact_topk) / len(exact_topk)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"


def test_ivf_probe_widening_recovers_exact(emb, exact_topk):
    """nprobe == n_centroids degenerates to exhaustive search — recall 1."""
    from user_behavior_spark_pipeline_spark.operators.similarity import ivf_topk

    full = set(
        map(
            tuple,
            ivf_topk(emb, n_centroids=8, nprobe=8)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    assert full == exact_topk
