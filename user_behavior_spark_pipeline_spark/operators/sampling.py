"""Deterministic sampling and dataset-split operators — the reproducibility
layer of a training-data pipeline (north-star suite; the reference has no
sampling surface at all).

Everything here is content/key-addressed, never RNG-addressed: the same row
lands in the same split on any cluster, any partitioning, any engine — which
is what makes train/test contamination auditable. (``df.sample``/``sampleBy``
are seeded per-partition and reshuffle-sensitive, fine for sizing estimates,
useless as a reproducible split contract; they're exercised in tests only.)

At 100 TB each operator is a scan-side projection or one window per stratum —
no extra shuffles beyond what the grouping itself requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col, num_buckets: int = 100):
    """Deterministic [0, num_buckets) bucket from md5 of the key's string
    form — engine-portable (md5 is md5 everywhere; Spark's ``hash``/xxhash64
    seeds are Spark-specific) and uniform regardless of key distribution."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % num_buckets
    )


def temperature_rates(df: DataFrame, stratum_col: str = "source") -> DataFrame:
    """The rate table of :func:`temperature_mixture` alone —
    (stratum, n_docs, rate_per_mille) — for callers that apply the
    survivor law themselves (e.g. the trainer-pipeline capstone)."""
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    from pyspark.sql import Window as W

    fs = F.floor(F.sqrt(F.col("n_docs"))).cast("long")
    # the Σ⌊√n⌋ total attaches as an unpartitioned window sum over the
    # (strata-sized) count table — one single-partition exchange of
    # metadata rows instead of the crossJoin-against-one-row-aggregate
    # shape, whose trivially-true join condition Catalyst folds back
    # into the BroadcastNestedLoopJoin the plan lint forbids
    return counts.withColumn("_fs", fs).withColumn(
        "_tot", F.sum("_fs").over(W.partitionBy())
    ).select(
        "stratum",
        "n_docs",
        # `div` is Spark SQL's INTEGER division — a float `/` could
        # round 49.999.. up and disagree with the oracle's `//`
        F.expr("(1000 * _fs) div _tot").cast("long").alias(
            "rate_per_mille"
        ),
    )


def temperature_mixture(
    df: DataFrame,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture weights COMPUTED FROM the corpus (the
    multilingual-LLM sampling law p_s ∝ n_s^α, here α = 1/2): per-
    stratum rates derive from observed counts instead of a hand-tuned
    table (mixture_sample's input), flattening head strata and
    up-weighting the tail. Survivors follow the same key-addressed
    md5-bucket law, so the reproducibility contract holds.

    Exactness: rates use ⌊√n⌋ INTEGER arithmetic end to end —
    rate_s = 1000·⌊√n_s⌋ // Σ_t ⌊√n_t⌋ — and IEEE sqrt is correctly
    rounded, so floor(sqrt(n)) is engine-portable for every n < 2^52
    (any real per-stratum count). No float ever reaches a comparison.

    Scale shape: one partial-aggregable count per stratum (metadata-
    sized), the rate table broadcast back onto the scan, the survivor
    filter scan-side, and one final per-stratum aggregation. Returns
    (stratum, n_docs, rate_per_mille, n_sampled, sampled_id_sum).
    """
    rates = temperature_rates(df, stratum_col)
    sampled = (
        df.select(
            F.col(stratum_col).alias("stratum"), F.col(id_col).alias("_id")
        )
        .join(F.broadcast(rates), "stratum")
        .filter(hash_bucket(F.col("_id"), 1000) < F.col("rate_per_mille"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("_id").alias("sampled_id_sum"),
        )
    )
    return (
        rates.join(sampled, "stratum", "left")
        .na.fill({"n_sampled": 0, "sampled_id_sum": 0})
        .select(
            "stratum",
            "n_docs",
            "rate_per_mille",
            F.col("n_sampled").cast("long").alias("n_sampled"),
            F.col("sampled_id_sum").cast("long").alias("sampled_id_sum"),
        )
    )


def train_test_split(
    df: DataFrame, id_col: str = "doc_id", test_pct: int = 20
) -> DataFrame:
    """Stable hash split: rows whose md5 bucket < ``test_pct`` are 'test'.

    Key-addressed, so a document keeps its split assignment across runs,
    re-partitions, and incremental corpus additions — new rows never flip
    old rows' splits (the failure mode of fraction-based sampling)."""
    bucket = hash_bucket(F.col(id_col))
    return df.withColumn(
        "split", F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def kfold_split(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """K-fold assignment for cross-validation: fold = md5 bucket mod k —
    key-addressed like :func:`train_test_split` (stable under
    repartitioning and corpus growth; every id's fold is a pure function
    of the id), scan-side, zero shuffle.

    With ``pairs`` (a near-dup pair frame), folds are keyed on the
    near-dup COMPONENT instead of the raw id — the k-fold generalization
    of :func:`leakage_safe_split`: near-identical documents always share
    a fold, so no fold's held-out set is contaminated by another fold's
    training copies."""
    if pairs is not None:
        from .dedup import dedup_components

        comp = dedup_components(pairs).withColumnRenamed("doc_id", id_col)
        keyed = df.join(comp, id_col, "left").withColumn(
            "_fold_key", F.coalesce(F.col("component"), F.col(id_col))
        )
    else:
        keyed = df.withColumn("_fold_key", F.col(id_col))
    out = keyed.withColumn(
        "fold", hash_bucket(F.col("_fold_key"), num_buckets=10_000) % k
    ).drop("_fold_key")
    return out.drop("component") if pairs is not None else out


def stratified_systematic_sample(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    every_k: int = 10,
) -> DataFrame:
    """Every k-th row per stratum, in ``order_col`` order — equal sampling
    pressure on every stratum (a uniform sample starves small strata) with
    deterministic, engine-reproducible membership.

    One window shuffle on the stratum key; at scale prefer a coarse
    ``order_col`` prefix filter first if strata are whale-sized."""
    w = Window.partitionBy(stratum_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % every_k == 0)
        .drop("_rn")
    )


def mixture_sample(
    df: DataFrame,
    rates_per_mille: dict[str, int],
    id_col: str = "doc_id",
    stratum_col: str = "source",
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic mixture sampling: keep each stratum at its own rate
    (per-mille), key-addressed — the "dataset mixing weights" step of
    pre-training data assembly (e.g. upsample wiki, downsample crawl).

    A row survives iff md5_bucket(id, 1000) < rate(stratum). Because
    membership is keyed on the row id, refreshing one source or growing
    the corpus NEVER flips other rows in or out of the mixture (the
    reproducibility contract of this module); rates are exact in
    expectation and ±O(√n) per stratum in realization.

    Scan-side projection + filter — zero shuffles; the rate table enters
    the plan as a literal CASE, so predicate pushdown still applies to
    any stratum whose rate is 0 (the CASE folds to a filterable FALSE
    only per-row — drop those strata with a pushed-down filter first when
    a source is fully excluded at 100 TB).
    """
    bucket = hash_bucket(F.col(id_col), 1000)
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(r)).otherwise(rate)
    return df.filter(bucket < rate)


def leakage_safe_split(
    documents: DataFrame,
    pairs: DataFrame,
    test_pct: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup-AWARE train/test split: the split is keyed on the
    document's connected COMPONENT in the near-dup pair graph, so two
    near-identical documents can never straddle train/test — the
    evaluation-contamination leak a plain per-id hash split cannot
    prevent (id hashes are independent; a paraphrased copy of a test
    document lands in train with probability 1 - test_pct).

    ``pairs`` is any (doc_id_1, doc_id_2) near-dup pair frame (n-gram
    Jaccard, MinHash, SimHash, embedding — caller's choice of detector);
    documents without a near-dup keep their own id as component, making
    the assignment identical to :func:`train_test_split` on the
    duplicate-free majority. Same md5 key-addressing, so assignments are
    engine-portable and stable under corpus growth — new duplicates of
    an EXISTING component inherit its split instead of re-rolling it."""
    from .dedup import dedup_components

    # dedup_components returns hard-coded (doc_id, component) columns;
    # rename its key so a non-default id_col joins instead of raising
    # AnalysisException (ADVICE r05)
    comp = dedup_components(pairs).withColumnRenamed("doc_id", id_col)
    labeled = documents.select(id_col).join(comp, id_col, "left").select(
        id_col,
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
    )
    bucket = hash_bucket(F.col("component"))
    return labeled.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 50,
    prune_partitions: int = 0,
) -> DataFrame:
    """Deterministic fixed-size uniform sample per group: the k rows with
    the smallest md5(id) in each group — reservoir sampling's contract
    (every subset of size k equally likely under the hash's uniformity)
    with this module's key-addressing instead of an RNG, so membership
    is stable across runs, engines and partitionings, and OUTPUT SIZE IS
    BOUNDED (k rows per group) no matter how skewed the group sizes are.
    PRECONDITION: ``id_col`` must be unique within each group — two
    different rows sharing an id tie on the (md5, id) sort key and
    row_number picks arbitrarily, voiding both the stability contract
    and the two-phase/naive equivalence at the k boundary (pre-dedup or
    extend the orderBy with the remaining columns if keys can repeat)
    — the property rate-based sampling (:func:`mixture_sample`) cannot
    give: a 10^9-row whale group still yields exactly k rows.

    Scale plan: the naive form is one window (row_number over the group,
    ordered by hash) — a full sort of each group in a single task, which
    a whale group turns into the straggler. With ``prune_partitions >
    0`` a LOCAL top-k pass runs first: rows are sprayed into
    (group, salt) cells by a hash of the id (deterministic — not
    spark_partition_id, whose numbering is plan-dependent), each cell
    keeps its k smallest, and only ``prune_partitions * k`` survivors
    per group reach the global window — the classic two-phase top-k.
    Any row in the TRUE global top-k is also in its own cell's top-k
    (min-k is a monotone per-cell property), so pruning is lossless and
    both forms return identical rows (pinned by test). Survivor count is
    tiny, so the second window's per-group sort is O(salt·k log salt·k).

    NULL ids are dropped up front (ADVICE r07): md5(NULL) is NULL and
    Spark's ASC sort puts NULLS FIRST while DuckDB defaults NULLS LAST,
    so a NULL id would silently diverge between engine and oracle — and
    a NULL id also can't satisfy the uniqueness precondition. The oracle
    SQL carries the matching ``WHERE id IS NOT NULL``.
    """
    df = df.filter(F.col(id_col).isNotNull())
    key = F.md5(F.col(id_col).cast("string"))
    if prune_partitions > 0:
        salt = hash_bucket(F.col(id_col), prune_partitions)
        local = Window.partitionBy(F.col(group_col), salt).orderBy(
            key.asc(), F.col(id_col).asc()
        )
        df = (
            df.withColumn("_lrn", F.row_number().over(local))
            .filter(F.col("_lrn") <= k)
            .drop("_lrn")
        )
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
