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


def test_redact_pii_on_constructed_dirty_strings(spark):
    """Known-answer PII fixtures: each class detected and replaced, the
    SSN-before-phone order respected, emails with IP-like domains split
    correctly, non-ASCII text byte-hashed identically, NULL text stays
    NULL."""
    import hashlib

    from user_behavior_spark_pipeline_spark.operators.text import redact_pii

    rows = [
        (1, "reach me at jo.do+spam@mail.example.org or 192.168.0.1 ok"),
        (2, "ssn 123-45-6789 then phone 555-867-5309 done"),
        (3, "user@10.0.0.1 is not an email but holds an ip"),
        (4, "日本語テキスト contact 太郎: taro@example.jp 以上"),
        (5, None),
        (6, "clean text with numbers 12345 and 1.2 nothing to redact"),
        # digits abutting non-ASCII letters: Java \b and RE2 \b DISAGREE
        # here (Spark misses, DuckDB hits), which is why PII_PATTERNS are
        # boundary-free — this row pins that the SSN is caught
        (7, "語123-45-6789語"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}

    def h(s):
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    assert (got[1]["n_email"], got[1]["n_ipv4"]) == (1, 1)
    assert got[1]["redacted_md5"] == h("reach me at [EMAIL] or [IP] ok")
    assert (got[2]["n_ssn"], got[2]["n_phone"]) == (1, 1)
    assert got[2]["redacted_md5"] == h("ssn [SSN] then phone [PHONE] done")
    # '@10.0.0.1' has no alphabetic TLD -> not an email; the IP still is
    assert (got[3]["n_email"], got[3]["n_ipv4"]) == (0, 1)
    assert got[3]["redacted_md5"] == h("user@[IP] is not an email but holds an ip")
    assert got[4]["n_email"] == 1
    assert got[4]["redacted_md5"] == h("日本語テキスト contact 太郎: [EMAIL] 以上")
    assert got[5]["redacted_md5"] is None
    assert all(got[6][f"n_{c}"] == 0 for c in ("email", "ipv4", "ssn", "phone"))
    assert got[6]["redacted_md5"] == h(rows[5][1])
    assert got[7]["n_ssn"] == 1
    assert got[7]["redacted_md5"] == h("語[SSN]語")


def test_redact_pii_plan_is_scan_side_only(spark, sf_dir):
    """redact_pii claims 'no shuffle at all' — pin it: the physical plan
    must contain no Exchange (pure per-row projection over the scan)."""
    from user_behavior_spark_pipeline_spark.operators.text import redact_pii
    from user_behavior_spark_pipeline_spark.plans import explain_str
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    plan = explain_str(redact_pii(load_table(spark, sf_dir, "documents")))
    assert "Exchange" not in plan, plan[:1500]


def test_unigram_nll_hand_computed(spark):
    """3-token corpus 'x x y': N=3, V=2, p-denominator 5. Doc NLL must be
    the exact sum of per-token micro-nat quanta (round once per distinct
    count, THEN sum) — not a float mean."""
    import math

    from user_behavior_spark_pipeline_spark.operators.text import unigram_nll

    docs = spark.createDataFrame(
        [(1, "x x"), (2, "y")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_nll(docs).collect()}
    nll_x = round((math.log(5) - math.log(3)) * 1e6)  # c(x)=2 -> ln(5/3)
    nll_y = round((math.log(5) - math.log(2)) * 1e6)  # c(y)=1 -> ln(5/2)
    assert out[1]["n_tokens"] == 2
    assert out[1]["nll_micro_sum"] == 2 * nll_x
    assert out[2]["n_tokens"] == 1
    assert out[2]["nll_micro_sum"] == nll_y
    # rarer token => higher NLL (the quality-filter signal direction)
    assert out[2]["nll_micro_sum"] > nll_x


def test_gopher_quality_rules(spark):
    """Each Gopher rule flips on a crafted document; the conjunction
    passes only the clean long-form one."""
    from user_behavior_spark_pipeline_spark.operators.text import (
        gopher_quality,
    )

    good = ("the data and results that we have measured with care " * 8).strip()
    docs = spark.createDataFrame(
        [
            (0, good),  # passes everything
            (1, "short doc that ends here and now"),  # R1: < 50 words
            (2, good + " " + " ".join(["#x"] * 60)),  # R3: symbol ratio
            (3, "\n".join(["- item " + str(i) for i in range(5)])
                + "\n" + good),  # bullets 5/6 lines < 90% -> passes R4
            (4, "\n".join([good, "a line...", "more..."])),  # R5 trips
            (5, ("0101 1100 1010 0111 " * 20).strip()),  # R6: no alpha
            (6, ("lorem ipsum dolor sit amet " * 12).strip()),  # R7: no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_quality(docs).collect()}
    assert rows[0].passes_gopher
    assert not rows[1].passes_gopher and rows[1].n_words < 50
    assert not rows[2].passes_gopher and rows[2].symbol_ratio_x1000 > 100
    assert rows[3].passes_gopher and 0 < rows[3].bullet_line_ratio_x1000 < 900
    assert not rows[4].passes_gopher and rows[4].ellipsis_line_ratio_x1000 >= 300
    assert not rows[5].passes_gopher and rows[5].alpha_word_ratio_x1000 < 800
    assert not rows[6].passes_gopher and rows[6].n_stopwords_hit < 2
    # plan stays native: no Python eval nodes
    plan = gopher_quality(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
