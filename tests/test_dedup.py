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


def test_simhash_strict_threshold_is_precise(spark):
    """Hamming <= 2 pairs must be exactly the planted near-dups on a
    corpus with DISTINCTIVE per-doc vocabulary.

    Deliberately a constructed corpus, not the generated fixture: the
    testdata generator draws every document from the same ~30-word
    vocabulary, so simhash signatures cluster by construction and
    strict-threshold 'precision' there measures generator luck (it
    flipped between 0 and 3 false positives across regenerations/SFs).
    With distinctive vocabularies, precision is a property of the
    ALGORITHM: unrelated docs share no tokens, so only the planted pairs
    may fall within hamming 2 — at any SPARK_GRAFT_TEST_SF."""
    import random

    rng = random.Random(11)
    rows = []
    for d in range(300):
        toks = [f"d{d}w{rng.randrange(1000)}" for _ in range(30)]
        rows.append((d, " ".join(toks), "s"))
    # planted duplicate pairs: identical text ⇒ identical signatures ⇒
    # hamming 0 — guaranteed recall at the strict threshold (even a
    # single changed token flips ~4 signature bits in expectation, which
    # would make a "one token off" plant flaky at hamming <= 2)
    for i in range(5):
        body = [f"p{i}tok{j}" for j in range(40)]
        rows.append((1000 + i * 2, " ".join(body), "s"))
        rows.append((1001 + i * 2, " ".join(body), "s"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    strict = simhash_near_pairs(docs, max_hamming=2).toPandas()
    got = set(zip(strict.doc_id_1, strict.doc_id_2))
    want = {(1000 + i * 2, 1001 + i * 2) for i in range(5)}
    assert want <= got, f"planted pairs missed: {want - got}"
    assert got <= want, f"false positives: {got - want}"


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


def test_embedding_lsh_recall_on_perturbed_near_dups(spark, sf_dir):
    """Plant NEAR (not exact) duplicates — each vector scaled per-element by
    a deterministic factor that keeps cosine ~0.97 — and require high recall
    from the LSH path against the exact path on the same corpus."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.dedup import (
        embedding_near_dup_lsh,
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    n = emb.count()
    # element i scaled by 1 + 0.1*sin(vec_id + i): deterministic, angle ~14°
    perturbed = emb.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (1.0 + 0.1 * F.sin(F.col("vec_id") + i)),
        ).alias("embedding"),
        "label",
    )
    planted = emb.unionByName(perturbed).cache()
    exact = set(
        map(
            tuple,
            embedding_near_dup_pairs(planted, threshold=0.9)
            .select("vec_id_1", "vec_id_2")
            .toPandas()
            .values,
        )
    )
    assert len(exact) >= n * 0.9, "perturbation should keep pairs above 0.9"
    lsh = set(
        map(
            tuple,
            embedding_near_dup_lsh(planted, threshold=0.9)
            .select("vec_id_1", "vec_id_2")
            .toPandas()
            .values,
        )
    )
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, f"embedding-LSH recall {recall:.2f}"
    assert lsh <= exact, "verify step must kill every false candidate"


def test_semantic_dedup_recall_vs_exact_blocked_baseline(spark, sf_dir):
    """SemDeDup vs the exact blocked all-pairs baseline on the real corpus:
    within-cluster scoring is EXACT, so every semantic pair must be in the
    exact set (precision 1.0); cross-cluster misses are the documented
    approximation, gated by a catastrophe floor (threshold-0.4 pairs on
    this corpus are unclustered noise — measured recall 0.37-0.42 across
    n_clusters 8/16/32, so 0.2 only trips on a broken assignment)."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        embedding_near_dup_blocked,
        semantic_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    key = lambda r: (r["vec_id_1"], r["vec_id_2"])  # noqa: E731
    exact = set(map(key, embedding_near_dup_blocked(emb, 0.4).collect()))
    sem = set(map(key, semantic_near_dup_pairs(emb, 0.4, 16).collect()))
    assert sem <= exact, f"false pairs: {sorted(sem - exact)[:5]}"
    recall = len(sem & exact) / max(1, len(exact))
    assert recall >= 0.2, f"semantic recall collapsed: {recall:.2f}"


def test_semantic_dedup_catches_planted_paraphrases(spark, sf_dir):
    """The SemDeDup claim that matters: TIGHT pairs (paraphrases, cosine
    ~0.97) land in the same cluster and are caught — unlike the noise
    pairs of the corpus-recall test, a near-identical pair only splits
    when it straddles a Voronoi boundary. Same deterministic perturbation
    as the LSH recall test above."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.dedup import (
        semantic_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    n = emb.count()
    perturbed = emb.select(
        (F.col("vec_id") + n).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (1.0 + 0.1 * F.sin(F.col("vec_id") + i)),
        ).alias("embedding"),
        "label",
    )
    planted = emb.unionByName(perturbed)
    sem = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in semantic_near_dup_pairs(planted, 0.9, 8).collect()
    }
    caught = sum(1 for i in range(n) if (i, i + n) in sem)
    assert caught >= 0.9 * n, f"planted-paraphrase recall {caught}/{n}"


def test_lsh_auto_knobs_scale_with_corpus():
    """The SCALE.md operating rule as code: bits grow by log2 of corpus
    growth (constant per-bucket density → near-linear candidates), tables
    grow ~1.17x per added bit (recall compensation); small corpora keep
    the hand-tuned floors exactly."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        lsh_auto_knobs,
    )

    assert lsh_auto_knobs(100) == (8, 6)
    assert lsh_auto_knobs(8192) == (8, 6)
    bits32, tables32 = lsh_auto_knobs(8192 * 32)
    assert bits32 == 8 + 5
    assert tables32 > 6  # recall compensation kicked in
    # candidate-density invariant: N / 2^bits stays <= the floor density
    for n in (8192, 8192 * 8, 8192 * 32, 8192 * 1024):
        bits, _ = lsh_auto_knobs(n)
        assert n / (1 << bits) <= 8192 / (1 << 8) + 1e-9


def test_embedding_near_dup_exact_baseline_refuses_unbounded_collect(
    spark, sf_dir
):
    """The all-pairs oracle baseline collects the corpus matrix to the
    driver — past max_collect_rows it must refuse with a pointer to the
    scale paths instead of attempting the collect."""
    import pytest

    from user_behavior_spark_pipeline_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="embedding_near_dup_blocked"):
        embedding_near_dup_pairs(emb, threshold=0.4, max_collect_rows=10)


def test_dedup_components_transitive_merge(spark):
    """A chain a-b, b-c plus a separate pair d-e must yield two components
    {a,b,c}->a and {d,e}->d."""
    from user_behavior_spark_pipeline_spark.operators.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_1 long, doc_id_2 long"
    )
    got = {
        r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_simhash_banding_has_exact_candidate_recall(docs):
    """The banded candidate set must contain EVERY pair at Hamming <=
    max_hamming (pigeonhole over max_hamming+1 bands) — verified against
    an exhaustive all-pairs popcount on the collected signatures."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        simhash_signatures,
    )

    max_h = 4
    sigs = {
        r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()
    }
    ids = sorted(sigs)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= max_h:
                expect.add((a, b))
    got = set(
        map(
            tuple,
            simhash_near_pairs(docs, max_hamming=max_h)
            .select("doc_id_1", "doc_id_2")
            .toPandas()
            .values,
        )
    )
    assert expect <= got, f"missing pairs: {sorted(expect - got)[:5]}"
    assert got == expect  # popcount verify also removes every false positive


def test_blocked_exact_equals_collected_exact(spark, sf_dir):
    """The distributed block-join exact form must reproduce the numpy
    collect-based exact form bit-for-bit (same rounding grain)."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        embedding_near_dup_blocked,
        embedding_near_dup_pairs,
    )
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    key = lambda r: (r["vec_id_1"], r["vec_id_2"], r["cosine_x1e6"])
    blocked = sorted(map(key, embedding_near_dup_blocked(emb, 0.4).collect()))
    exact = sorted(map(key, embedding_near_dup_pairs(emb, 0.4).collect()))
    assert blocked == exact and len(blocked) > 0


def test_blocked_exact_plan_is_cogrouped_not_cartesian(spark, sf_dir):
    """All-pairs must run as the block-pair cogroup (one Arrow matmul per
    group) — never a CartesianProduct/BNLJ materializing two rows per
    pair."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        embedding_near_dup_blocked,
    )
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    plan = embedding_near_dup_blocked(
        load_table(spark, sf_dir, "embeddings"), 0.4
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "FlatMapCoGroupsInPandas" in plan, plan


def test_incremental_matches_full_pair_semantics(spark):
    """A new doc near-dup of a corpus doc is flagged with the right best
    match; a clean new doc passes; corpus-internal dups don't leak in."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        incremental_near_dup,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    corpus = spark.createDataFrame(
        [
            (1, base, "s"),
            (2, base, "s"),            # corpus-internal dup — must not matter
            (3, "z1 z2 z3 z4 z5", "s"),
        ],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (10, base + " w11", "s"),  # near-dup of docs 1 and 2
            (11, "q1 q2 q3 q4 q5 q6", "s"),  # clean
        ],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: r for r in
           incremental_near_dup(new, corpus, n=3, threshold=0.5).collect()}
    assert got[10]["is_dup"] and got[10]["best_match_doc"] == 1  # min-id tie-break
    assert got[10]["best_jaccard_x1e6"] >= 500000
    assert not got[11]["is_dup"] and got[11]["best_match_doc"] is None
    assert got[11]["best_jaccard_x1e6"] == 0


def test_incremental_is_idempotent_decision(spark):
    """Replaying the same delta batch yields byte-identical decisions (the
    idempotent-ingest contract)."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        incremental_near_dup,
    )

    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h", "s")], "doc_id long, text string, source string"
    )
    new = spark.createDataFrame(
        [(10, "a b c d e f g x", "s")], "doc_id long, text string, source string"
    )
    r1 = sorted(map(tuple, incremental_near_dup(new, corpus).collect()))
    r2 = sorted(map(tuple, incremental_near_dup(new, corpus).collect()))
    assert r1 == r2


def test_parse_byte_conf_units():
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        _parse_byte_conf,
    )

    assert _parse_byte_conf("128MB") == 128 << 20
    assert _parse_byte_conf("4m") == 4 << 20
    assert _parse_byte_conf("1048576") == 1 << 20
    assert _parse_byte_conf("1g") == 1 << 30
    assert _parse_byte_conf("134217728b") == 128 << 20
    assert _parse_byte_conf(" 64KB ") == 64 << 10


def test_estimated_scan_partitions_tracks_planner(spark, tmp_path):
    """The estimate must track Spark's ACTUAL scan-partition count (it
    replicates the planner's file-packing arithmetic) — raw file count is
    a misjudgment in both directions (packing merges tiny files, splitting
    divides big ones). Checked on a many-tiny-files layout, the case the
    old file-count heuristic got wrong."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        _estimated_scan_partitions,
    )

    out = str(tmp_path / "tiny")
    spark.range(0, 640).repartition(64).write.mode("overwrite").parquet(out)
    df = spark.read.parquet(out)
    files = df.inputFiles()
    assert len(files) >= 32
    est = _estimated_scan_partitions(spark, files)
    actual = df.rdd.getNumPartitions()
    assert est is not None
    # within 2x of the planner in either direction — close enough for the
    # repartition-or-not decision, impossible for a raw file count to hit
    # on both this layout and a few-big-files layout
    assert actual / 2 <= est <= max(2 * actual, actual + 2), (est, actual)


def test_portable_token_hash_matches_duckdb(spark):
    """The md5-based portable hash must parse identically in Spark (conv)
    and DuckDB ('0x'||…::BIGINT) — the cross-engine contract behind
    x_dedup_simhash_portable. Property-checked over awkward strings."""
    import duckdb

    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.dedup import (
        _portable_token_hash,
    )

    tokens = [
        "", "a", "hello", "ZZZ", "0", "sword_event", "naïve", "日本語",
        "with space", "tab\tchar", "ünïcödé", "x" * 500, "'quote'", '"dq"',
    ]
    df = spark.createDataFrame([(t,) for t in tokens], "t string")
    got = {
        r["t"]: r["h"]
        for r in df.select("t", _portable_token_hash(F.col("t")).alias("h")).collect()
    }
    con = duckdb.connect()
    for t in tokens:
        (want,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
        ).fetchone()
        assert got[t] == want, f"hash divergence for {t!r}"


# ---------------------------------------------------------------------------
# Property-based: dedup_components must equal union-find on ANY random edge
# set — including long chains (diameter > a few hops) and rings, the shapes
# that stress iterative label propagation's convergence loop.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es)),
)
def test_components_match_union_find_property(spark, edges):
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        dedup_components,
    )

    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_id_1 long, doc_id_2 long")
    got = {
        r["doc_id"]: r["component"]
        for r in dedup_components(pairs).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id of the component
    members: dict[int, list[int]] = {}
    for n in parent:
        members.setdefault(find(n), []).append(n)
    want = {n: min(ms) for r, ms in members.items() for n in ms}
    assert got == want, edges


def test_components_chain_converges_logarithmically(spark):
    """A 200-node chain is the worst case for plain min-label propagation
    (rounds = diameter; past max_iters it silently returned WRONG
    labels). Pointer jumping must converge in O(log n) rounds with every
    label equal to the chain head."""
    from user_behavior_spark_pipeline_spark.operators import dedup

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_1 long, doc_id_2 long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.dedup_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}
    assert dedup._LAST_COMPONENT_ROUNDS <= 10, (
        f"chain of {n} took {dedup._LAST_COMPONENT_ROUNDS} rounds — "
        "pointer jumping should be logarithmic"
    )


def test_shingle_df_cap_kills_boilerplate_pairs_keeps_real_ones(spark):
    """Hot-shingle guard: a header shared by every doc must stop
    generating candidate pairs once capped, while a genuinely near-dup
    pair (distinctive bodies) survives with the same Jaccard in BOTH the
    exact and the LSH path."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    header = "h1 h2 h3 h4 h5 h6"
    rows = [
        (i, f"{header} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f", "s")
        for i in range(40)
    ]
    body = " ".join(f"d{j}" for j in range(30))
    rows += [(100, f"{header} {body}", "s"), (101, f"{header} {body} xtra", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    exact = sorted(
        map(tuple, ngram_jaccard_pairs(docs, 3, 0.5, max_shingle_df=5).collect())
    )
    lsh = sorted(
        map(tuple, minhash_lsh_pairs(docs, 3, 0.5, max_shingle_df=5).collect())
    )
    assert exact == lsh
    assert [(a, b) for (a, b, _) in exact] == [(100, 101)]
    # the capped Jaccard is over distinctive shingles only — the header's
    # shingles are out of both numerator and denominator
    uncapped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in ngram_jaccard_pairs(docs, 3, 0.5).collect()
    }
    assert (100, 101) in uncapped


def test_incremental_near_dup_df_cap_consistent(spark):
    """The corpus-df hot-shingle guard must drop boilerplate-only matches
    while keeping real ones, and every new doc still gets a verdict row."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        incremental_near_dup,
    )

    header = "h1 h2 h3 h4 h5 h6"
    corpus = spark.createDataFrame(
        [(i, f"{header} c{i}a c{i}b c{i}c c{i}d c{i}e", "s") for i in range(30)]
        + [(900, f"{header} b1 b2 b3 b4 b5 b6 b7 b8", "s")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (1000, f"{header} n1 n2 n3 n4 n5", "s"),  # header-only overlap
            (1001, f"{header} b1 b2 b3 b4 b5 b6 b7 b8 b9", "s"),  # real dup of 900
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["doc_id"]: r
        for r in incremental_near_dup(
            new, corpus, n=3, threshold=0.5, max_shingle_df=5
        ).collect()
    }
    assert set(got) == {1000, 1001}
    assert not got[1000]["is_dup"]
    assert got[1001]["is_dup"] and got[1001]["best_match_doc"] == 900


def test_simhash_token_df_cap_separates_boilerplate_docs(spark):
    """With a dominant shared header, uncapped simhash signatures cluster
    (many spurious near-Hamming pairs); capping the token df restores
    separation for distinct bodies while true near-dups stay paired."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        simhash_near_pairs,
    )

    header = " ".join(f"h{i}" for i in range(40))
    rows = [
        (i, f"{header} u{i}a u{i}b u{i}c u{i}d u{i}e", "s") for i in range(30)
    ]
    body = " ".join(f"d{j}" for j in range(40))
    rows += [(100, f"{header} {body}", "s"), (101, f"{header} {body}", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    uncapped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in simhash_near_pairs(docs, max_hamming=4).collect()
    }
    capped = {
        (r["doc_id_1"], r["doc_id_2"])
        for r in simhash_near_pairs(
            docs, max_hamming=4, max_token_df=10
        ).collect()
    }
    # header-dominated signatures pair unrelated docs; the cap cuts them
    assert len(capped) < len(uncapped)
    assert (100, 101) in capped


def test_simhash_token_df_is_document_frequency_not_occurrences(spark):
    """max_token_df counts DISTINCT documents, so a whale document
    repeating a distinctive token thousands of times must not evict that
    token from every other document's signature corpus-wide — other
    docs' signatures are bit-identical with and without the whale."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        simhash_signatures,
    )

    base = [
        (i, f"alpha bravo doc{i}x doc{i}y doc{i}z", "s") for i in range(6)
    ]
    docs = spark.createDataFrame(
        base, "doc_id long, text string, source string"
    )
    whale_text = " ".join(["alpha"] * 500 + ["whaleonly"])
    with_whale = spark.createDataFrame(
        base + [(999, whale_text, "s")],
        "doc_id long, text string, source string",
    )
    cap = 10  # 'alpha' df: 7 docs <= 10, but 506 occurrences > 10
    sig_without = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, max_token_df=cap).collect()
    }
    sig_with = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(with_whale, max_token_df=cap).collect()
    }
    for doc_id, sig in sig_without.items():
        assert sig_with[doc_id] == sig, (
            f"doc {doc_id}: whale repetition perturbed an unrelated "
            "signature — df must be per-document, not occurrence count"
        )


def test_simhash_planted_cert_flags_are_falsifiable(spark, sf_dir):
    """found_ok is TRUE for every planted copy on the real corpus; an
    impossible pair-count bound flips pairs_bounded_ok — both flags carry
    real signal, not tautology."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        simhash_planted_cert,
    )
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    ok = simhash_planted_cert(docs).collect()
    assert len(ok) == 50
    assert all(r["found_ok"] and r["pairs_bounded_ok"] for r in ok)

    strict = simhash_planted_cert(docs, max_pairs_per_doc=0).collect()
    assert all(r["found_ok"] for r in strict)
    assert not any(r["pairs_bounded_ok"] for r in strict)


def test_duplicated_spans_exact_counts_and_edges(spark):
    """Span in 3 docs counted once per doc (within-doc repeats collapse);
    docs shorter than n yield nothing; sub-threshold spans absent."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        duplicated_spans,
    )

    shared = "one two three four five"
    rows = [
        (1, f"{shared} tail a"),
        (2, f"head {shared}"),
        # within-doc repetition of the shared span: still ONE doc
        (3, f"{shared} x {shared}"),
        (4, "totally different words here now"),
        (5, "short doc"),  # < n tokens -> no spans at all
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["span"]: (r["n_docs"], r["min_doc_id"])
        for r in duplicated_spans(docs, n=5, min_docs=2).collect()
    }
    assert out[shared] == (3, 1)
    # doc 4's spans are unique -> never emitted
    assert not any("totally" in s for s in out)
    # every emitted span really is in >= 2 docs
    assert all(n >= 2 for n, _ in out.values())


def test_duplicated_spans_giant_doc_and_shared_tail(spark):
    """A 200k-token document transits the span explode; its planted overlap
    with a small doc is still found (whale + needle in one fixture)."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        duplicated_spans,
    )

    needle = "alpha bravo charlie delta echo"
    giant = " ".join(f"t{i % 9973}x{i}" for i in range(200_000)) + " " + needle
    docs = spark.createDataFrame(
        [(1, giant), (2, f"prefix {needle} suffix")],
        "doc_id long, text string",
    )
    out = duplicated_spans(docs, n=5, min_docs=2).collect()
    assert [r["span"] for r in out] == [needle]
    assert out[0]["n_docs"] == 2 and out[0]["min_doc_id"] == 1


def _bruteforce_mems(t1, t2, minlen):
    """Per-diagonal scan: maximal runs of position-wise equal tokens."""
    out = []
    for d in range(-len(t1), len(t2) + 1):
        run = 0
        for p1 in range(1, len(t1) + 2):
            p2 = p1 + d
            match = (
                p1 <= len(t1)
                and 1 <= p2 <= len(t2)
                and t1[p1 - 1] == t2[p2 - 1]
            )
            if match:
                run += 1
            else:
                if run >= minlen:
                    out.append((p1 - run, p1 - run + d, run))
                run = 0
    return out


def test_maximal_substrings_equal_bruteforce_mems(spark):
    """maximal_duplicated_substrings == per-diagonal brute force on a
    fixture with straddling runs, an exact copy, periodic text (multiple
    diagonals), and within-doc repeats."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        maximal_duplicated_substrings,
    )

    docs = [
        (1, "a b c d e f g h i j k l"),
        (2, "x x a b c d e f g y y z"),
        (3, "q q q c d e f g h i j w"),
        (4, "p p p p p"),
        (5, "a b c d e f g h i j k l"),  # exact copy of 1
        (6, "m m m m m m m m"),          # periodic vs 4? no — vs itself only
        (7, "p p p p p p p"),            # periodic overlap with 4: many diagonals
        (8, "a b c d e f a b c d e f"),  # within-doc repeat vs 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, maximal_duplicated_substrings(df, n=5).collect())
    )
    toks = {i: t.split() for i, t in docs}
    exp = sorted(
        (i, j, s1, s2, L)
        for i in toks
        for j in toks
        if i < j
        for s1, s2, L in _bruteforce_mems(toks[i], toks[j], 5)
    )
    assert got == exp
    # the exact-copy pair must surface as one full-length run
    assert (1, 5, 1, 1, 12) in got
    # periodic pair (4, 7): one run per overlapping diagonal
    assert sum(1 for r in got if r[:2] == (4, 7)) == 3


def test_maximal_substrings_min_tokens_and_anchor_cap(spark):
    """min_tokens drops short runs; max_anchor_df drops boilerplate-seeded
    runs (anchor in > cap docs) while keeping distinctive ones."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        maximal_duplicated_substrings,
    )

    boiler = "this page is copyright two thousand"
    docs = [(i, f"{boiler} unique{i} tail{i}") for i in range(10)]
    docs += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = maximal_duplicated_substrings(df, n=5).collect()
    assert sum(1 for r in uncapped if r["doc_id_1"] < 100) == 45  # 10c2 boiler pairs
    capped = sorted(
        map(tuple, maximal_duplicated_substrings(df, n=5, max_anchor_df=5).collect())
    )
    assert capped == [(100, 101, 1, 1, 7)]  # boilerplate gone, real run kept
    long_only = maximal_duplicated_substrings(df, n=5, min_tokens=8).collect()
    assert [tuple(r) for r in long_only if r["doc_id_1"] >= 100] == []
    assert all(r["n_tokens"] >= 8 for r in long_only)


def test_maximal_substrings_anchor_tf_cap_tames_periodic_text(spark):
    """max_anchor_tf drops pathologically self-repeating anchors (the
    O(L²) seed-match blowup on periodic text) while leaving runs in
    normal text untouched."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        maximal_duplicated_substrings,
    )

    docs = [
        (1, " ".join(["x"] * 200)),
        (2, " ".join(["x"] * 200)),
        (3, "alpha beta gamma delta epsilon zeta eta"),
        (4, "alpha beta gamma delta epsilon zeta iota"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    capped = sorted(
        map(
            tuple,
            maximal_duplicated_substrings(df, n=5, max_anchor_tf=50).collect(),
        )
    )
    assert capped == [(3, 4, 1, 1, 6)]  # periodic pair gone, real run kept
    # uncapped: the periodic pair alone yields one run per diagonal
    uncapped = maximal_duplicated_substrings(df, n=5).collect()
    assert sum(1 for r in uncapped if r["doc_id_1"] == 1) > 300


def test_strip_duplicated_substrings_semantics(spark):
    """Strip action: lowest-doc occurrence keeps the run, higher docs lose
    it; untouched docs pass through; an exact copy strips to empty."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        strip_duplicated_substrings,
    )

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x1 x2 a b c d e f g y1 y2"),   # shares a..g (7) with 1
        (3, "a b c d e f g h i j"),          # exact copy of 1
        (4, "solo tokens only here now"),    # untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in strip_duplicated_substrings(df, n=5).collect()}
    assert len(got) == 4
    # doc 1 is the lowest occurrence everywhere: untouched
    assert got[1]["text_stripped"] == "a b c d e f g h i j"
    assert got[1]["n_tokens_removed"] == 0
    # doc 2 loses the 7-token run, keeps its flanks
    assert got[2]["text_stripped"] == "x1 x2 y1 y2"
    assert got[2]["n_tokens_removed"] == 7
    # doc 3 is an exact copy of a lower doc: strips to empty
    assert got[3]["text_stripped"] == ""
    assert got[3]["n_tokens_removed"] == 10 and got[3]["n_tokens_before"] == 10
    # doc 4 untouched
    assert got[4]["text_stripped"] == "solo tokens only here now"
    assert got[4]["n_tokens_removed"] == 0


def test_strip_overlapping_runs_union_positions(spark):
    """Two runs overlapping in the same higher doc strip the UNION of
    their positions (no double-count, no gap)."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        strip_duplicated_substrings,
    )

    # doc 3 shares "a b c d e f" with doc 1 and "d e f g h i" with doc 2;
    # in doc 3 they overlap on d e f -> union strip = a..i (9 tokens)
    docs = [
        (1, "a b c d e f q1 q2 q3 q4"),
        (2, "d e f g h i w1 w2 w3 w4"),
        (3, "z1 a b c d e f g h i z2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in strip_duplicated_substrings(df, n=5).collect()}
    assert got[3]["text_stripped"] == "z1 z2"
    assert got[3]["n_tokens_removed"] == 9
    assert got[1]["n_tokens_removed"] == 0
    # doc 2 shares "d e f" with doc 1 — but that's only 3 tokens (< n): kept
    assert got[2]["n_tokens_removed"] == 0


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc embedded verbatim in a long one: containment ~1.0,
    Jaccard far below threshold — the asymmetric detector's reason to
    exist. Both directions reported; disjoint docs absent."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_containment_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(12))
    long_doc = " ".join(f"w{i}" for i in range(200)) + " " + quote
    docs = [
        (1, quote),
        (2, long_doc),
        (3, " ".join(f"z{i}" for i in range(50))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = shingle_containment_pairs(df, n=3, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_id_1"], r["doc_id_2"]) == (1, 2)
    assert r["containment_1_in_2_x1e6"] == 1_000_000  # fully contained
    assert r["containment_2_in_1_x1e6"] < 100_000
    # Jaccard at 0.5 misses this pair entirely
    assert ngram_jaccard_pairs(df, n=3, threshold=0.5).count() == 0


def test_incremental_substring_verdict_semantics(spark):
    """Delta screening: planted overlap found with correct length, best
    match ties break to min corpus id, clean docs report zeros, and
    corpus-internal duplication is ignored."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        incremental_substring_verdict,
    )

    run = " ".join(f"r{i}" for i in range(8))
    corpus = [
        (1, f"alpha beta {run} gamma delta"),
        (2, f"x1 x2 {run} x3 x4"),        # same run — tie on length -> min id 1
        (3, "c c c c c c"),                # corpus-internal junk, no effect
    ]
    new = [
        (100, f"n1 n2 n3 {run} n4"),       # overlaps both corpus docs
        (101, "clean tokens nothing shared here at all"),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in incremental_substring_verdict(cdf, ndf, n=5).collect()
    }
    assert len(got) == 2
    assert got[100]["max_run_tokens"] == 8
    assert got[100]["n_covered_tokens"] == 8
    assert got[100]["best_match_doc"] == 1  # tie -> min corpus id
    assert got[101]["max_run_tokens"] == 0
    assert got[101]["n_covered_tokens"] == 0
    assert got[101]["best_match_doc"] is None


def test_incremental_substring_anchor_cap_tames_boilerplate(spark):
    """A header shared by every corpus doc AND the delta seeds
    |delta| x |corpus| matches; the corpus-df cap suppresses it while a
    distinctive planted run still reports."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        incremental_substring_verdict,
    )

    boiler = "this site is generated by engine nine"
    run = " ".join(f"r{i}" for i in range(8))
    corpus = [(i, f"{boiler} body{i} tail{i}") for i in range(20)]
    corpus.append((50, f"x1 {run} x2"))
    new = [(100, f"{boiler} fresh tokens"), (101, f"n1 {run} n2")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    ndf = spark.createDataFrame(new, "doc_id long, text string")
    capped = {
        r["doc_id"]: r
        for r in incremental_substring_verdict(
            cdf, ndf, n=5, max_anchor_df=5
        ).collect()
    }
    assert capped[100]["max_run_tokens"] == 0  # boilerplate suppressed
    assert capped[101]["max_run_tokens"] == 8  # distinctive run kept
    assert capped[101]["best_match_doc"] == 50
    uncapped = {
        r["doc_id"]: r
        for r in incremental_substring_verdict(cdf, ndf, n=5).collect()
    }
    assert uncapped[100]["max_run_tokens"] == 7  # the boiler run itself


# Property-based MEM invariant (hypothesis): random low-alphabet corpora
# maximize diagonal structure, within-doc repeats, and boundary cases —
# the operator must equal the per-diagonal brute force on ALL of them.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_mem_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=1, max_size=30
    ),
    min_size=2,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=_mem_corpus, n=st.integers(2, 4))
def test_maximal_substrings_property_equals_bruteforce(spark, corpus, n):
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        maximal_duplicated_substrings,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        map(tuple, maximal_duplicated_substrings(df, n=n).collect())
    )
    toks = {i: t.split() for i, t in docs}
    exp = sorted(
        (i, j, s1, s2, L)
        for i in toks
        for j in toks
        if i < j
        for s1, s2, L in _bruteforce_mems(toks[i], toks[j], n)
    )
    assert got == exp


def test_exact_duplicates_hashed_equals_text_keyed(spark, docs):
    """The hash-keyed variant (x_dedup_exact_hashed) must produce the
    EXACT text-keyed group set: same representatives, same cardinalities,
    on the real corpus (dup groups + unique docs) and on an edge frame
    with NULL text and empty strings."""
    from user_behavior_spark_pipeline_spark.operators.dedup import (
        exact_duplicates_hashed,
    )

    want = sorted(map(tuple, exact_duplicates(docs).collect()))
    got = sorted(map(tuple, exact_duplicates_hashed(docs).collect()))
    assert got == want

    edge = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c"),
            (3, None),
            (4, None),
            (5, ""),
            (6, "unique text"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        map(tuple, exact_duplicates(edge).collect()),
        key=lambda t: (t[0] is None, t),
    )
    got = sorted(
        map(tuple, exact_duplicates_hashed(edge).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == want
