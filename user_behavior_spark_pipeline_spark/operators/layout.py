"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

A single-column sort clusters one predicate dimension; interleaving the
bits of two (bounded) dimensions into one sort key clusters BOTH, so
parquet min/max footer stats prune files for predicates on either column —
the lakehouse OPTIMIZE ZORDER BY trick, as a plain Column expression.
Pure bit arithmetic (shifts/and/or), identical in any engine, no UDF.

At 100 TB this is a sink-side `sortWithinPartitions(z)` before write —
zero extra shuffles beyond the write's own partitioning; the payoff is
scan-side file skipping, verified by the footer-stats locality test."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 10) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    z = … b1 a1 b0 a0. Caller buckets raw values into [0, 2^bits) first
    (quantile or fixed-width — rank preservation is all that matters)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_key_sql(a: str, b: str, bits: int = 10) -> str:
    """The identical formula as engine-neutral SQL text (oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
