"""Arrow-lane BPE tokenization with a real-size merge table — the
trainer-fidelity path that replaces the 12-merge codegen toy
(corpus.bpe_symbol_stream) for production vocabularies.

Why not codegen: the literal-replace chain is O(|merges|) full-string
rewrites per document — certified-correct at 12 merges but structurally
impossible at a real vocabulary (a 50k-merge GPT-2/LLaMA-class table
would be 50k sequential passes, and even 12 passes produced the repo's
only >1.0 scale exponent, SCALE.md r12 watchlist). The kernel here is
the classic greedy BPE encoder (GPT-2 reference shape): pre-tokenize
into ``\\S+`` words and ``\\s+`` runs (runs are atomic tokens, so
concatenating the token stream reconstructs the text verbatim), then
per word repeatedly merge the LOWEST-RANK adjacent pair until none
remains. Cost is O(len(word)^2) worst-case per DISTINCT word — a
per-worker LRU-ish cache makes the amortized cost per token near-zero
on natural text where words repeat (Zipf).

The 100 TB shape: the merge table is a plan-time constant captured by
the UDF closure — broadcast once per executor inside the serialized
function, never joined, never shuffled; tokenization itself is an
Arrow-batched scalar pandas_udf (scan-side, embarrassingly parallel,
zero exchanges). Downstream accounting (packing cumsum, chunk
explode) reuses the exact codegen shapes of corpus.pack_spans /
corpus.chunk_documents.

Certification: the DuckDB oracles embed TEMPLATE_TOKENS — the
tokenizations of the 32 fixture templates computed by the NAIVE
reference implementation in tools/gen_bpe_vocab.py (transparent
quadratic rescan-from-rank-0 loop, generated offline, committed) — so
the kernel must agree with an independent implementation for the
driver hash to stay green; pytest additionally pins kernel == naive
over adversarial strings and every template (test_corpus).

Reference parity note: the reference pipeline has no tokenizer
(SURVEY.md §2.1); this is training-data extension surface (§2.5).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from .bpe_vocab import BPE_MERGES_1K, BPE_TEMPLATES, TEMPLATE_TOKENS

__all__ = [
    "BPE_MERGES_1K",
    "BPE_TEMPLATES",
    "TEMPLATE_TOKENS",
    "bpe_encode_word",
    "bpe_encode_text",
    "bpe_token_count_arrow",
    "bpe_tokens_arrow",
    "synth_bpe_text",
    "chunk_documents_bpe_arrow",
]

_PRETOKEN = re.compile(r"\S+|\s+")

#: cache cap per python worker — distinct words above this spill to
#: recompute (never to memory growth); natural text stays far below
_CACHE_CAP = 1 << 16


def bpe_encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> tuple[str, ...]:
    """Greedy lowest-rank-first BPE of one word (the GPT-2 reference
    loop): find the adjacent pair with the lowest merge rank, merge all
    its non-overlapping occurrences left-to-right, repeat."""
    if cache is not None:
        hit = cache.get(word)
        if hit is not None:
            return hit
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (sym[i], sym[i + 1])
        if best_rank is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        n = len(sym)
        while i < n:
            if i < n - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    res = tuple(sym)
    if cache is not None and len(cache) < _CACHE_CAP:
        cache[word] = res
    return res


def bpe_encode_text(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, tuple[str, ...]] | None = None,
) -> list[str]:
    """Whole-text token stream: words BPE-encoded, whitespace runs kept
    as single atomic tokens — ''.join(tokens) == text, always."""
    out: list[str] = []
    for tok in _PRETOKEN.findall(text):
        if tok.strip():
            out.extend(bpe_encode_word(tok, ranks, cache))
        else:
            out.append(tok)
    return out


def _ranks(merges: tuple[tuple[str, str], ...]) -> dict:
    return {m: i for i, m in enumerate(merges)}


def bpe_token_count_arrow(
    col, merges: tuple[tuple[str, str], ...] = BPE_MERGES_1K
):
    """Column of exact BPE token counts — Arrow-batched scalar
    pandas_udf, merge table in the closure (broadcast with the task,
    no join). NULL text counts NULL (excluded upstream by pack_spans'
    explicit filter)."""
    ranks = _ranks(merges)

    @F.pandas_udf(LongType())
    def _count(texts):
        import pandas as pd

        cache: dict[str, tuple[str, ...]] = {}
        return pd.Series(
            [
                None
                if t is None
                else len(bpe_encode_text(t, ranks, cache))
                for t in texts
            ],
            dtype="Int64",
        )

    return _count(col)


def bpe_tokens_arrow(
    col, merges: tuple[tuple[str, str], ...] = BPE_MERGES_1K
):
    """Column of BPE token ARRAYS (verbatim symbols, whitespace runs
    included) for tokenizer-aware chunking."""
    ranks = _ranks(merges)

    @F.pandas_udf(ArrayType(StringType()))
    def _tokens(texts):
        import pandas as pd

        cache: dict[str, tuple[str, ...]] = {}
        return pd.Series(
            [
                None if t is None else bpe_encode_text(t, ranks, cache)
                for t in texts
            ]
        )

    return _tokens(col)


def synth_bpe_text(doc_id_col):
    """The deterministic fixture text for the BPE driver queries:
    template(doc_id % 32) repeated doc_id % 3 + 1 times joined by
    single spaces, then ' ' + str(doc_id). Pure codegen (element_at on
    a literal array + array_repeat + concat). The corresponding token
    stream has the closed form

        (T_k + [' ']) * R + digit_chars,   R = doc_id % 3 + 1

    where T_k = TEMPLATE_TOKENS[k] (naive-reference tokenization,
    committed) and the doc_id digits stay single-character tokens
    because the trained table contains no digit merges — that is what
    lets the DuckDB oracle state the result without running a
    tokenizer."""
    tpl = F.element_at(
        F.array(*[F.lit(t) for t in BPE_TEMPLATES]),
        (doc_id_col % 32).cast("int") + 1,
    )
    reps = (doc_id_col % 3 + 1).cast("int")
    return F.concat(
        F.concat_ws(" ", F.array_repeat(tpl, reps)),
        F.lit(" "),
        doc_id_col.cast("string"),
    )


def chunk_documents_bpe_arrow(
    documents: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    merges: tuple[tuple[str, str], ...] = BPE_MERGES_1K,
) -> DataFrame:
    """Tokenizer-aware chunking at a real vocabulary size: the Arrow
    kernel produces the bound token array, then the SAME
    sequence+slice+explode codegen as corpus.chunk_documents windows
    it (chunk_text = verbatim symbol concatenation, so chunks exactly
    tile the character stream). One Python stage (the tokenizer),
    zero shuffles."""
    toks = bpe_tokens_arrow(F.col("text"), merges)
    tokenized = documents.filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    ).select("doc_id", toks.alias("_t"))
    t = F.col("_t")
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(t), F.lit(stride)),
        lambda i: F.struct(
            ((i - 1) / stride).cast("long").alias("chunk_index"),
            F.array_join(F.slice(t, i, chunk_tokens), "").alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), F.size(t) - i + 1)
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return tokenized.select("doc_id", F.explode(chunks).alias("_c")).select(
        "doc_id", "_c.chunk_index", "_c.chunk_text", "_c.n_tokens"
    )
