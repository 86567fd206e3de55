"""Data-quality expectations: dbt-test/Great-Expectations-style checks as
composable DataFrame aggregates returning one (check, violations) row each.

The reference validates rows only structurally (`_is_valid_event`'s
key-presence gate, ingest.py parity shim); a pipeline feeding a 100 TB
corpus needs declarative CONTENT contracts — null-ness, uniqueness,
accepted domains, ranges, referential integrity — evaluated continuously
and cheaply.

Scale design (why this isn't one query per check):

- all ROW-LEVEL checks against one table (not-null / accepted-values /
  range) fold into a SINGLE scan: each check is a conditional count in
  one aggregate, so a 12-check suite on a 100 TB fact costs one pass,
  not 12. The per-check rows are unpivoted from that one aggregate row
  with ``stack`` — an Expand over one row, not a re-scan per check;
- UNIQUENESS is count − count_distinct in the same single aggregate
  (one extra shuffle keyed on the column — unavoidable: uniqueness is a
  global property);
- REFERENTIAL integrity is a left-anti join counting orphan foreign
  keys. The parent side prunes to its key column before the join;
  distinct-ing the child's FK first keeps the anti join's probe side at
  |distinct fk| (violations are reported as orphan KEYS, documented —
  counting orphan ROWS instead would carry the full fact through the
  join for the same boolean answer per key).

Everything returns exact integer counts — engine-portable by
construction, no tolerance needed."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _viol(name: str, cond: Column) -> Column:
    """Violation counter: rows where ``cond`` (the EXPECTATION) fails.
    NULL condition results count as violations (an expectation that
    can't be evaluated isn't met) — except in not_null itself, where
    the null IS the condition."""
    return F.count(
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(1))
    ).alias(name)


def row_checks(
    df: DataFrame,
    checks: dict[str, Column],
    uniques: list[str] = (),
) -> DataFrame:
    """One-scan expectation suite over one table.

    ``checks``: {check_name: expectation Column (True = row passes)}.
    ``uniques``: column names whose values must be globally unique.
    Returns (check, n_violations) — one row per check."""
    aggs = [_viol(name, cond) for name, cond in sorted(checks.items())]
    for col in uniques:
        aggs.append(
            (F.count(F.col(col)) - F.countDistinct(F.col(col))).alias(
                f"unique_{col}"
            )
        )
    wide = df.agg(*aggs)
    names = sorted(checks) + [f"unique_{c}" for c in uniques]
    pairs = ", ".join(f"'{n}', `{n}`" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"
    )


def referential_check(
    name: str, child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> DataFrame:
    """Orphan-FK count: distinct child keys with no parent row."""
    orphans = (
        child.select(F.col(fk).alias("_fk"))
        .where(F.col("_fk").isNotNull())
        .distinct()
        .join(
            parent.select(F.col(pk).alias("_fk")).distinct(),
            "_fk",
            "left_anti",
        )
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(name).alias("check_name"), "n_violations"
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-table suites + referential checks into one report,
    ordered by check name (deterministic output contract)."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")
