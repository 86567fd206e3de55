"""Round-3 watch-list closure: the engine-portable oracles must stay
hash-green when `documents.text` leaves ASCII (a testdata regeneration
could do this silently — VERDICT r03 'data-dependence' item).

The fixture swaps `documents.parquet` for a synthetic multi-script corpus
(Latin accents, CJK, Greek, Cyrillic, Hebrew with combining marks, an
emoji — multi-byte UTF-8 throughout) and re-runs the exact registry
query + oracle pairs through the same compare the driver uses:

- x_multimodal_decode_q: the decode stub histograms BYTES, so the oracle
  must too (hex(encode(text)) nibble parse) — the old char-based oracle
  split on the first non-ASCII char.
- x_dedup_simhash_portable: md5 over UTF-8 bytes agrees between engines
  for any script; pinned here so a regex/tokenizer change can't silently
  reintroduce a char/byte split.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from user_behavior_spark_pipeline_spark.registry import ORACLES, QUERIES

from .oracle_utils import assert_frames_match, duckdb_connection

_WATCHED = ["x_multimodal_decode_q", "x_dedup_simhash_portable"]

_NONASCII_WORDS = [
    "café", "naïve", "中文词", "日本語", "héllo", "übermäßig",
    "δelta", "Ωmega", "emoji😀x", "пример", "שָׁלוֹם", "ñandú",
]


@pytest.fixture(scope="module")
def nonascii_sf_dir(sf_dir, tmp_path_factory) -> str:
    """sf_dir clone with a non-ASCII documents table."""
    base = tmp_path_factory.mktemp("nonascii_sf")
    for f in os.listdir(sf_dir):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(sf_dir, f), base / f)
    rng = random.Random(7)
    ascii_words = [f"tok{i}" for i in range(50)]
    rows = []
    for d in range(60):
        n = rng.randint(5, 30)
        toks = [
            rng.choice(ascii_words if rng.random() < 0.5 else _NONASCII_WORDS)
            for _ in range(n)
        ]
        text = " ".join(toks)
        rows.append((d, text, "xx", f"s{d % 3}", len(text)))
    # planted near-dup pair built from multi-byte tokens: many DISTINCT
    # shared tokens dominate the sign-sum, so one extra token perturbs
    # only a few signature bits (hamming <= 4)
    dup = " ".join(f"wörd{i}中" for i in range(60))
    rows.append((100, dup, "xx", "s0", len(dup)))
    rows.append((101, dup + " Ωxtra", "xx", "s0", len(dup) + 6))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{base / 'documents.parquet'}' (FORMAT PARQUET)")
    con.close()
    return str(base)


@pytest.mark.parametrize("name", _WATCHED)
def test_portable_oracle_survives_nonascii_text(spark, nonascii_sf_dir, name):
    spdf = QUERIES[name](spark, nonascii_sf_dir).toPandas()
    con = duckdb_connection(nonascii_sf_dir)
    try:
        oracle_pdf = con.execute(ORACLES[name]).df()
    finally:
        con.close()
    assert len(spdf) > 0, f"{name}: empty result proves nothing"
    assert_frames_match(spdf, oracle_pdf, name)
