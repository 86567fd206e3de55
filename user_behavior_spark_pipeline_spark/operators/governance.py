"""Data-governance operators: k-anonymity auditing and right-to-erasure
propagation — the compliance surface a 100 TB user-behavior pipeline is
legally required to have and the reference (five Kafka filter scripts)
never approaches.

Both are exact-count reports, engine-portable by construction (no floats
anywhere), and scale as one hash-aggregate / one anti-join per table —
the same shapes the DQ suite (dq.py) uses, pointed at privacy rather
than validity."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_identifiers: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: every row must be
    indistinguishable from >= k-1 others on the QI columns, or the
    equivalence class is re-identifiable (Sweeney, k-anonymity, 2002).

    Returns one row: class counts, the count of classes smaller than k,
    and the rows at risk inside them — the numbers a release gate checks
    before publishing an aggregate extract. One shuffle keyed on the QI
    tuple (map-side combined); the report aggregate is a single row, so
    cost is the groupBy and nothing else at any scale. NULL QI values
    form their own class (groupBy semantics) — deliberate: an all-NULL
    tuple is exactly as linkable as any other shared tuple."""
    classes = df.groupBy(*quasi_identifiers).agg(
        F.count(F.lit(1)).alias("_sz")
    )
    return classes.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_classes"),
        F.count(F.when(F.col("_sz") < k, F.lit(1))).alias("n_small_classes"),
        F.coalesce(
            F.sum(F.when(F.col("_sz") < k, F.col("_sz"))), F.lit(0)
        ).alias("n_rows_at_risk"),
        F.coalesce(F.min("_sz"), F.lit(0)).alias("min_class_size"),
    )


def erasure_audit(
    tables: dict[str, tuple[DataFrame, str]], tombstones: DataFrame
) -> DataFrame:
    """Right-to-erasure propagation report: for each (table, subject-key
    column), how many rows the tombstone set owns and how many survive
    its anti-join purge — rows_before = rows_purged + rows_after is the
    conservation invariant a deletion job must satisfy before swapping
    the purged output in.

    ``tables``: {name: (df, subject_col)}; ``tombstones``: one column
    ``subject_id``. The tombstone set (users who invoked erasure) is
    small by nature -> ONE broadcast left join per table marks owned
    rows, and a single aggregate counts before/purged/after in the same
    scan — no second pass, no one-row crossJoin. At 100 TB the audit is
    bounded by one scan per table; the purge rewrite itself (`purge`,
    the anti-join primitive the audit's counts predict, pytest-pinned
    equal) is bounded by scan + write — the storage floor without a
    subject-key index."""
    # distinct FIRST: a duplicated subject in the tombstone list (an
    # erasure-request log replays) would row-multiply the left join and
    # inflate rows_before/rows_purged while purge()'s anti join stayed
    # correct — the audit would stop predicting the purge it certifies
    tombstones = tombstones.select("subject_id").distinct()
    parts = []
    for name in sorted(tables):
        df, col = tables[name]
        marked = df.select(F.col(col).alias("_subj")).join(
            F.broadcast(tombstones),
            F.col("_subj") == F.col("subject_id"),
            "left",
        )
        parts.append(
            marked.agg(
                F.count(F.lit(1)).alias("rows_before"),
                F.count(F.col("subject_id")).alias("rows_purged"),
            ).select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_purged",
                (F.col("rows_before") - F.col("rows_purged")).alias(
                    "rows_after"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


def purge(df: DataFrame, subject_col: str, tombstones: DataFrame) -> DataFrame:
    """The erasure primitive: drop every row whose subject key appears in
    the tombstone set (broadcast anti join — NULL subject keys survive,
    matching SQL NOT-IN-with-non-null-list semantics)."""
    return df.join(
        F.broadcast(tombstones),
        df[subject_col] == tombstones["subject_id"],
        "left_anti",
    )
