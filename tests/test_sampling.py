"""Sampling/split invariants: the properties that make a split a CONTRACT
(stability, key-addressing) rather than a one-off random draw."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.sampling import (
    stratified_systematic_sample,
    train_test_split,
)
from user_behavior_spark_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_split_is_stable_under_repartitioning(docs):
    a = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in train_test_split(docs.repartition(7)).collect()
    }
    assert a == b


def test_split_is_stable_under_corpus_growth(spark, docs):
    """Adding rows must not flip existing rows' assignments."""
    half = docs.filter("doc_id % 2 = 0")
    full = {r["doc_id"]: r["split"] for r in train_test_split(docs).collect()}
    part = {r["doc_id"]: r["split"] for r in train_test_split(half).collect()}
    assert all(full[k] == v for k, v in part.items())


def test_split_fraction_near_target(docs):
    got = train_test_split(docs, test_pct=20)
    n = got.count()
    n_test = got.filter("split = 'test'").count()
    assert 0.10 <= n_test / n <= 0.30  # md5 buckets ~uniform; wide tolerance


def test_stratified_sample_covers_every_stratum(docs):
    sample = stratified_systematic_sample(docs, "lang", "doc_id", every_k=10)
    assert (
        sample.select("lang").distinct().count()
        == docs.select("lang").distinct().count()
    )


def test_stratified_sample_takes_first_of_each_stratum(docs):
    import pyspark.sql.functions as F

    firsts = docs.groupBy("lang").agg(F.min("doc_id").alias("doc_id"))
    sample = stratified_systematic_sample(docs, "lang", "doc_id", every_k=10)
    missing = firsts.join(sample.select("lang", "doc_id"), ["lang", "doc_id"], "left_anti")
    assert missing.count() == 0


def test_sample_by_api_surface(docs):
    """df.sampleBy (seeded, NOT reproducible across engines) — API parity
    only: fractions are respected loosely and strata outside the dict drop."""
    fracs = {"en": 0.5}
    got = docs.sampleBy("lang", fractions=fracs, seed=7)
    assert got.filter("lang <> 'en'").count() == 0


def test_mixture_sample_rates_and_stability(spark, sf_dir):
    """Rates land near targets; membership is key-addressed — refreshing a
    source (dropping its rows) never changes which OTHER rows survive."""
    from user_behavior_spark_pipeline_spark.operators.sampling import (
        mixture_sample,
    )
    from user_behavior_spark_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1000, "src1": 500}
    kept = mixture_sample(docs, rates, default_rate=0).select("doc_id", "source")
    got = {r["doc_id"] for r in kept.collect()}
    n0 = docs.filter(F.col("source") == "src0").count()
    k0 = kept.filter(F.col("source") == "src0").count()
    k1 = kept.filter(F.col("source") == "src1").count()
    n1 = docs.filter(F.col("source") == "src1").count()
    assert k0 == n0  # 1000 per mille keeps everything
    assert abs(k1 / n1 - 0.5) < 0.25  # small-n tolerance
    assert kept.filter(~F.col("source").isin("src0", "src1")).count() == 0
    # stability: removing src0 entirely leaves src1's membership unchanged
    kept2 = mixture_sample(
        docs.filter(F.col("source") != "src0"), rates, default_rate=0
    )
    got2 = {r["doc_id"] for r in kept2.collect()}
    assert got2 == {d for d in got} - {
        r["doc_id"] for r in docs.filter(F.col("source") == "src0").collect()
    }


def test_mixture_sample_plan_is_scan_side(spark, sf_dir):
    from user_behavior_spark_pipeline_spark.operators.sampling import (
        mixture_sample,
    )
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    plan = mixture_sample(
        load_table(spark, sf_dir, "documents"), {"src0": 500}, default_rate=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Planted near-dup families must land whole in ONE split (the
    contamination guard), singletons must match the plain per-id hash
    split, and both split values must actually occur."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.sampling import (
        hash_bucket,
        leakage_safe_split,
    )

    # 40 singleton docs + 10 near-dup families of 3 (ids 1000+3f..)
    docs = [(i,) for i in range(40)]
    pairs = []
    for f in range(10):
        a, b, c = 1000 + 3 * f, 1001 + 3 * f, 1002 + 3 * f
        docs += [(a,), (b,), (c,)]
        pairs += [(a, b), (b, c)]  # chain — transitivity must hold
    ddf = spark.createDataFrame(docs, "doc_id long")
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    got = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(ddf, pdf, test_pct=30).collect()
    }
    assert len(got) == 70
    for f in range(10):
        a, b, c = 1000 + 3 * f, 1001 + 3 * f, 1002 + 3 * f
        assert got[a] == got[b] == got[c], f"family {f} straddles splits"
    # singletons: identical to the plain id-hash assignment
    plain = {
        r["doc_id"]: r["s"]
        for r in spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
        .select(
            "doc_id",
            F.when(hash_bucket(F.col("doc_id")) < 30, "test")
            .otherwise("train")
            .alias("s"),
        )
        .collect()
    }
    assert all(got[i] == plain[i] for i in range(40))
    assert {"train", "test"} == set(got.values())


def test_leakage_safe_split_non_default_id_col(spark):
    """id_col other than 'doc_id' must work: dedup_components returns a
    hard-coded doc_id column which leakage_safe_split renames to the
    caller's id_col before joining (ADVICE r05 — previously raised
    AnalysisException)."""
    from user_behavior_spark_pipeline_spark.operators.sampling import (
        leakage_safe_split,
    )

    ddf = spark.createDataFrame([(i,) for i in range(20)], "item_id long")
    pdf = spark.createDataFrame([(3, 7), (7, 11)], "doc_id_1 long, doc_id_2 long")
    got = {
        r["item_id"]: r["split"]
        for r in leakage_safe_split(ddf, pdf, test_pct=30, id_col="item_id")
        .collect()
    }
    assert len(got) == 20
    assert got[3] == got[7] == got[11]


def test_kfold_split_stable_and_balanced(spark):
    """Every id gets a fold in [0, k); assignment is a pure function of
    the id (stable under repartition); folds are roughly balanced."""
    from user_behavior_spark_pipeline_spark.operators.sampling import kfold_split

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = {r["doc_id"]: r["fold"] for r in kfold_split(df, k=5).collect()}
    b = {
        r["doc_id"]: r["fold"]
        for r in kfold_split(df.repartition(13), k=5).collect()
    }
    assert a == b
    assert set(a.values()) == set(range(5))
    from collections import Counter

    counts = Counter(a.values())
    assert min(counts.values()) > 120  # ~200 expected per fold


def test_kfold_leakage_safe_keeps_families_together(spark):
    """With a near-dup pair frame, every family shares ONE fold."""
    from user_behavior_spark_pipeline_spark.operators.sampling import kfold_split

    docs = [(i,) for i in range(40)]
    pairs = []
    for f in range(10):
        a, b, c = 1000 + 3 * f, 1001 + 3 * f, 1002 + 3 * f
        docs += [(a,), (b,), (c,)]
        pairs += [(a, b), (b, c)]
    ddf = spark.createDataFrame(docs, "doc_id long")
    pdf = spark.createDataFrame(pairs, "doc_id_1 long, doc_id_2 long")
    got = {r["doc_id"]: r["fold"] for r in kfold_split(ddf, k=4, pairs=pdf).collect()}
    assert len(got) == 70
    for f in range(10):
        a, b, c = 1000 + 3 * f, 1001 + 3 * f, 1002 + 3 * f
        assert got[a] == got[b] == got[c]
    assert all(0 <= v < 4 for v in got.values())


def test_reservoir_two_phase_pruning_is_lossless(spark, sf_dir):
    """The skew-safe two-phase form (local per-(group, salt) top-k, then
    global top-k) must return EXACTLY the naive single-window rows — the
    min-k-is-monotone argument made executable."""
    from user_behavior_spark_pipeline_spark.operators.sampling import (
        reservoir_per_group,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id"
    )
    naive = reservoir_per_group(
        ev, "event_type", "event_id", k=7, prune_partitions=0
    )
    pruned = reservoir_per_group(
        ev, "event_type", "event_id", k=7, prune_partitions=5
    )
    a = sorted(map(tuple, naive.collect()))
    b = sorted(map(tuple, pruned.collect()))
    assert a == b and len(a) > 0


def test_reservoir_bounds_output_per_group_and_is_stable(spark, sf_dir):
    """Exactly min(k, |group|) rows per group; membership unchanged by
    repartitioning (key-addressed, the module contract)."""
    from user_behavior_spark_pipeline_spark.operators.sampling import (
        reservoir_per_group,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id"
    )
    sizes = dict(
        (r["event_type"], r["n"])
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    )
    out = reservoir_per_group(ev, "event_type", "event_id", k=9,
                              prune_partitions=4)
    got = dict(
        (r["event_type"], r["n"])
        for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    )
    assert got == {g: min(9, n) for g, n in sizes.items()}
    re = reservoir_per_group(
        ev.repartition(13), "event_type", "event_id", k=9, prune_partitions=4
    )
    assert sorted(map(tuple, re.collect())) == sorted(map(tuple, out.collect()))


def test_reservoir_property_two_phase_equals_naive_on_random_groups(spark):
    """Hypothesis: for ANY group-size profile (including whales and
    singleton groups) and any (k, salt-count), the two-phase pruned form
    returns exactly the naive single-window rows — the lossless-pruning
    claim as a property, not just on the fixture."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from user_behavior_spark_pipeline_spark.operators.sampling import (
        reservoir_per_group,
    )

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(1, 40), min_size=1, max_size=5),
        k=st.integers(1, 8),
        salts=st.integers(1, 6),
    )
    def run(sizes, k, salts):
        rows, next_id = [], 0
        for g, n in enumerate(sizes):
            for _ in range(n):
                rows.append((f"g{g}", next_id))
                next_id += 1
        df = spark.createDataFrame(rows, "grp string, id long")
        naive = reservoir_per_group(df, "grp", "id", k=k, prune_partitions=0)
        pruned = reservoir_per_group(
            df, "grp", "id", k=k, prune_partitions=salts
        )
        assert sorted(map(tuple, naive.collect())) == sorted(
            map(tuple, pruned.collect())
        )

    run()


def test_temperature_mixture_integer_rate_law(spark):
    """rate_s = 1000*isqrt(n_s) // sum isqrt(n_t), survivors follow
    the md5-bucket law — verified against plain-Python recomputation;
    empty-survivor strata keep zero rows rather than disappearing."""
    import hashlib
    import math

    from user_behavior_spark_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr("doc_id", "CAST(doc_id % 7 AS STRING) AS stratum")
    got = {
        r["stratum"]: r
        for r in temperature_mixture(docs, stratum_col="stratum").collect()
    }
    rows = docs.collect()
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["stratum"]] = counts.get(r["stratum"], 0) + 1
    tot = sum(math.isqrt(n) for n in counts.values())
    for s, n in counts.items():
        rate = 1000 * math.isqrt(n) // tot
        assert got[s]["n_docs"] == n and got[s]["rate_per_mille"] == rate
        surv = [
            r["doc_id"]
            for r in rows
            if r["stratum"] == s
            and int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
            % 1000
            < rate
        ]
        assert got[s]["n_sampled"] == len(surv)
        assert got[s]["sampled_id_sum"] == sum(surv)
