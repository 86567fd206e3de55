"""The engine's scalar/column function library — one import point for every
reusable column expression the operators are built from.

The reference's scalar surface is tiny (cast / from_json / alias / json.loads
— SURVEY.md §2.6); ours adds the vector, text, and fixed-point-money
functions the extension operators need. Everything here is a pure Column
expression (JVM-side, codegen-able) — the deliberate exceptions are noted
where they live (pandas_udf / mapInPandas kernels in operators/).

Naming: `*_e4` / `*_x100` / `*_x1000` suffixes mark scaled-integer
fixed-point encodings — the cross-engine-exact alternative to summing
doubles (IEEE sum order is nondeterministic under parallel aggregation).
"""

from __future__ import annotations

from ..operators.joins import money_e4
from ..operators.similarity import (
    lsh_signature_col,
    normalized,
)
from ..operators.similarity import _dot as dot_product  # noqa: F401
from ..operators.similarity import _norm as l2_norm  # noqa: F401
from ..operators.text import tokens_col
from ..sources.generator import ref_event_columns

__all__ = [
    "money_e4",
    "normalized",
    "dot_product",
    "l2_norm",
    "lsh_signature_col",
    "tokens_col",
    "ref_event_columns",
]
