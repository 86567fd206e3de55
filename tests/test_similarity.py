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


@pytest.fixture(scope="module")
def emb_cal(emb):
    """Fixed-size calibration corpus for RECALL-metric tests: approximate
    recall at fixed knobs degrades with corpus size by design (more
    near-ties per query), so a floor calibrated on the small fixtures
    only measures the algorithm if the corpus size is pinned — vec_id
    < 500 is deterministic at every SPARK_GRAFT_TEST_SF. Exactness
    proofs (exhaustive twins) stay on the full fixture."""
    return emb.filter("vec_id < 500").cache()


@pytest.fixture(scope="module")
def exact_topk_cal(emb_cal):
    return set(
        map(
            tuple,
            brute_force_topk(emb_cal)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )


def test_ivf_recall(emb_cal, exact_topk_cal):
    from user_behavior_spark_pipeline_spark.operators.similarity import ivf_topk

    ivf = set(
        map(
            tuple,
            ivf_topk(emb_cal).select("query_id", "neighbor_id").toPandas().values,
        )
    )
    recall = len(ivf & exact_topk_cal) / len(exact_topk_cal)
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


def test_pq_recall(emb_cal, exact_topk_cal):
    """PQ/ADC top-k must beat a calibrated recall floor (64 codes × 16
    subspaces on 64-dim vectors; near-random synthetic embeddings are
    PQ's hardest case — measured 0.54 here — so the floor is modest; the
    production refinement re-ranks a PQ shortlist with true vectors)."""
    from user_behavior_spark_pipeline_spark.operators.similarity import pq_topk

    pq = set(
        map(
            tuple,
            pq_topk(emb_cal, 10, 5, m=16, n_codes=64)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    recall = len(pq & exact_topk_cal) / len(exact_topk_cal)
    assert recall >= 0.4, f"PQ recall {recall:.2f}"


def test_pq_shortlist_rerank_recovers_exact(emb, exact_topk):
    """PQ top-R shortlist (R >> k) re-ranked with TRUE cosines == exact
    top-k — the standard two-stage production pattern, proving the
    shortlist keeps the right neighbors even when PQ ordering is coarse."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.similarity import (
        pq_topk,
        with_cosine,
    )

    shortlist = pq_topk(emb, 10, 40, m=16, n_codes=64).select("query_id", "neighbor_id")
    truth = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e")
    )
    qs = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    ).filter(F.col("query_id") < 10)
    rescored = with_cosine(
        shortlist.join(F.broadcast(qs), "query_id").join(truth, "neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    reranked = set(
        map(
            tuple,
            rescored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 5)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    recall = len(reranked & exact_topk) / len(exact_topk)
    assert recall >= 0.9, f"rerank recall {recall:.2f}"


def test_pq_rerank_assert_and_widen_recovers_exact_from_narrow_start(
    emb, exact_topk
):
    """A deliberately-too-narrow initial shortlist must WIDEN (measured
    ADC-rank margin, operators/similarity.pq_rerank_topk) until the
    reranked result equals exact brute-force top-k — the round-3
    data-dependence fix: the equality claim survives any embedding
    distribution instead of relying on a fixed 256 staying wide enough."""
    from user_behavior_spark_pipeline_spark.operators.similarity import (
        pq_rerank_topk,
    )

    from user_behavior_spark_pipeline_spark.operators import similarity

    got = set(
        map(
            tuple,
            pq_rerank_topk(emb, 10, 5, shortlist=8)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    assert got == exact_topk
    # the accepted result must carry the certificate (widened past the
    # deliberately-narrow 8), not merely agree by luck
    assert similarity._LAST_PQ_CERTIFIED
    assert similarity._LAST_PQ_SHORTLIST > 8


def test_pq_rerank_equals_brute_force_on_shifted_distribution(spark):
    """The embedding-shift scenario the round-3 watch list feared: a
    clustered corpus (tight clusters around a few centers — nothing like
    the training sample's spread) must STILL produce reranked top-k ==
    exact brute force, because the certificate widens the shortlist to
    whatever this distribution needs. This is the PQ analogue of the
    non-ASCII text fixture."""
    import math
    import random

    from user_behavior_spark_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_rerank_topk,
    )

    rng = random.Random(99)
    dim, n_clusters, per_cluster = 64, 8, 50
    centers = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for c in centers:
        nrm = math.sqrt(sum(x * x for x in c))
        for _ in range(per_cluster):
            v = [x / nrm + rng.gauss(0, 0.02) for x in c]
            rows.append((vid, v, "s"))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = set(
        map(
            tuple,
            pq_rerank_topk(emb, 10, 5)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    want = set(
        map(
            tuple,
            brute_force_topk(emb, 10, 5)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    assert got == want


def test_certified_ann_flags_are_falsifiable(emb):
    """The certificate booleans must be able to FAIL — an impossible
    recall floor flips recall_ok to False while the planted-copy flag
    (deterministic for LSH) stays True. Guards against the certificate
    degenerating into a tautology the driver would rubber-stamp."""
    from user_behavior_spark_pipeline_spark.operators.similarity import (
        certified_ann_topk,
    )

    ok = certified_ann_topk(emb, "lsh", 10, 5).collect()
    assert len(ok) == 10
    assert all(r["planted_ok"] and r["recall_ok"] and r["n_results"] == 5 for r in ok)

    strict = certified_ann_topk(emb, "lsh", 10, 5, recall_floor=1.01).collect()
    assert all(r["planted_ok"] for r in strict)
    assert not any(r["recall_ok"] for r in strict)


def test_pq_certificate_below_corpus_on_clustered_data(spark):
    """On clustered embeddings (the realistic case — random gaussian is
    PQ's worst), the per-vector certificate must accept a shortlist WELL
    below corpus coverage: other-cluster vectors have adc + ‖y−ŷ‖ far
    under s_k, so the required width is ~the query's own cluster, not
    the corpus. Start narrow (32 < cluster size 50) to force at least
    one widening round and dodge the small-corpus exact shortcut."""
    import math
    import random

    from user_behavior_spark_pipeline_spark.operators import similarity
    from user_behavior_spark_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_rerank_topk,
    )

    rng = random.Random(7)
    dim, n_clusters, per_cluster = 64, 8, 50
    rows, vid = [], 0
    for _ in range(n_clusters):
        c = [rng.gauss(0, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in c))
        for _ in range(per_cluster):
            rows.append((vid, [x / nrm + rng.gauss(0, 0.02) for x in c], "s"))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = set(
        map(
            tuple,
            pq_rerank_topk(emb, 10, 5, shortlist=32)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    want = set(
        map(
            tuple,
            brute_force_topk(emb, 10, 5)
            .select("query_id", "neighbor_id")
            .toPandas()
            .values,
        )
    )
    assert got == want
    assert similarity._LAST_PQ_CERTIFIED
    n_corpus = len(rows)
    assert similarity._LAST_PQ_SHORTLIST < (n_corpus - 1) // 2, (
        f"certificate only accepted at {similarity._LAST_PQ_SHORTLIST} "
        f"of {n_corpus} — not 'well below corpus'"
    )


def test_lsh_signature_col_column_and_string_paths_agree(spark):
    """round-15 review: the generated-SQL fast path needs a column NAME;
    a computed Column must take the per-op Column build — both forms
    must produce identical signatures (same Catalyst semantics)."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.similarity import (
        _hyperplanes,
        lsh_signature_col,
    )

    planes = _hyperplanes(8, dim=4)
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 2.0, 0.25]), (2, [-0.125, 3.0, -2.5, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = df.select(
        "vec_id",
        lsh_signature_col("embedding", planes).alias("s_str"),
        lsh_signature_col(F.col("embedding"), planes).alias("s_col"),
        # a COMPUTED column (the case the _jc-string splice broke)
        lsh_signature_col(
            F.transform("embedding", lambda x: x * F.lit(1.0)), planes
        ).alias("s_expr"),
    ).collect()
    for r in got:
        assert r["s_str"] == r["s_col"] == r["s_expr"], r
