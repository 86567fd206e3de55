"""Similarity search over embedding columns (OP-X-SIM, SURVEY.md §2.5).

Three paths over `embeddings (vec_id, embedding array<float>, label)`:

- **brute-force top-k** (the correctness baseline): broadcast the query set,
  cross-join against the corpus, dot/norm via ``zip_with``/``aggregate`` —
  all JVM lambda functions, no Python. O(|Q|·N·d) but embarrassingly
  parallel: the corpus never shuffles, queries are broadcast, and the only
  shuffle is the final per-query top-k (tiny). This is exactly the shape
  that survives 100 TB — scoring is map-side; cap |Q| per pass.
- **LSH-bucketed top-k** (the scale path): random-hyperplane signatures
  (seeded, deterministic) bucket the corpus once; each query probes only its
  bucket neighborhood (Hamming <= probe_radius), turning O(N) per query into
  O(N / 2^bits · probed_buckets). Approximate — recall measured in tests
  against brute force.
- **pandas_udf scoring** (OP-X-UDF-SURFACE): the same brute-force semantics
  with Arrow-batched numpy scoring — demonstrates the vectorized Python
  escape hatch for kernels Spark can't express (real multimodal encoders).

Outputs are (query_id, neighbor_id, rank) — ranks, not raw float scores, so
results compare exactly across engines (adjacent similarities differ ~1e-3
here; cross-engine float noise is ~1e-12)."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EMBED_DIM = 64


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(scored: DataFrame, q_col: str = "qe", e_col: str = "e") -> DataFrame:
    qd, ed = _as_double(F.col(q_col)), _as_double(F.col(e_col))
    return scored.withColumn("cosine", _dot(qd, ed) / (_norm(qd) * _norm(ed)))


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def brute_force_topk(
    embeddings: DataFrame, num_queries: int = 10, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < num_queries (self excluded)."""
    q = embeddings.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = (
        embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    return _rank_topk(with_cosine(scored), k)


def _hyperplanes(bits: int, dim: int = EMBED_DIM, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_signature_col(emb_col, planes: list[list[float]]):
    """Random-hyperplane signature: bit i = sign(embedding · plane_i)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                _as_double(emb_col),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(F.shiftleft(F.when(d > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), i))
    return sig


def lsh_bucketed_topk(
    embeddings: DataFrame,
    num_queries: int = 10,
    k: int = 5,
    bits: int = 8,
    probe_radius: int = 3,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose LSH signature is
    within ``probe_radius`` bits of the query's signature."""
    planes = _hyperplanes(bits)
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e"),
        lsh_signature_col(F.col("embedding"), planes).alias("sig_e"),
    )
    q = embeddings.filter(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        lsh_signature_col(F.col("embedding"), planes).alias("sig_q"),
    )
    candidates = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(
            F.bit_count(F.col("sig_e").bitwiseXOR(F.col("sig_q"))) <= probe_radius
        )
    )
    return _rank_topk(with_cosine(candidates), k)


def pandas_cosine_topk(
    embeddings: DataFrame, num_queries: int = 10, k: int = 5
) -> DataFrame:
    """Brute-force top-k with Arrow-batched numpy scoring (pandas_udf).

    The query matrix is captured in the UDF closure (it is small — this is
    the broadcast); each Arrow batch of corpus vectors is scored as one
    matrix multiply. This is the pattern for Python-only kernels; for plain
    cosine the JVM path (brute_force_topk) is preferred."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qrows = (
        embeddings.filter(F.col("vec_id") < num_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [r["vec_id"] for r in qrows]
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    # NB: no type hints — `from __future__ import annotations` stringifies
    # them, which pandas_udf's signature inference rejects
    @pandas_udf("array<double>")
    def cosines(batch):
        m = np.array(batch.tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ q_mat.T  # (batch, |Q|)
        return pd.Series(list(sims))

    scored = (
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"), cosines("embedding").alias("cs")
        )
        .select(
            "neighbor_id",
            F.posexplode("cs").alias("q_idx", "cosine"),
        )
        .withColumn(
            "query_id",
            F.element_at(F.array(*[F.lit(i) for i in q_ids]), F.col("q_idx") + 1),
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    return _rank_topk(scored, k)
