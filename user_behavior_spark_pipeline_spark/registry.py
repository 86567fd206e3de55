"""Query registry: every implemented operator gets a named (spark, sf_dir) ->
DataFrame callable plus (where SQL-expressible) a DuckDB oracle twin.

This module is the single source of truth that ``__spark_entry__.py`` re-exports;
tests/test_oracle_parity.py replicates the driver's compare locally.

Determinism rules (every query here obeys them — the driver hash-compares
exact values, column-name keyed):

- never emit the raw ``events.ts`` (parquet TIMESTAMP(NANOS): Spark truncates
  to µs, DuckDB keeps ns) — only derived values (date_trunc, epoch buckets);
- aggregates over doubles are computed as exact integer sums of per-row
  scaled-and-rounded values (IEEE double arithmetic per row is deterministic
  across engines; summation ORDER of raw doubles is not);
- every computed column is explicitly aliased, same name on both sides;
- LIMIT queries are made deterministic with a unique-key ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is DuckDB SQL over the driver's
    pre-registered parquet views (None -> rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared SQL fragments: the deterministic events -> reference-event mapping
# (mirror of sources/generator.py — keep the two in sync)
# ---------------------------------------------------------------------------

REF_TYPE_SQL = (
    "CASE WHEN event_type = 'purchase' THEN 'sword_event' "
    "WHEN event_type = 'signup' THEN 'guild_event' ELSE 'default' END"
)
DIRECTION_SQL = "CASE WHEN event_id % 10 < 8 THEN 'increase' ELSE 'reduce' END"
DETAIL_SQL = (
    f"CASE WHEN {REF_TYPE_SQL} = 'sword_event' THEN "
    "  (CASE event_id % 4 WHEN 0 THEN 'wood' WHEN 1 THEN 'iron' "
    "        WHEN 2 THEN 'steel' ELSE 'gold' END) "
    f"WHEN {REF_TYPE_SQL} = 'guild_event' THEN "
    "  (CASE event_id % 2 WHEN 0 THEN 'starter guild' ELSE 'iron guild' END) "
    "ELSE NULL END"
)
HOST_SQL = "'Player ' || CAST(user_id % 10 AS VARCHAR)"

# CTE producing the mapped (new-shape) event fields for ALL events
MAPPED_CTE = f"""
WITH mapped AS (
  SELECT event_id,
         {REF_TYPE_SQL} AS event_type,
         {DIRECTION_SQL} AS direction,
         {DETAIL_SQL} AS event_detail,
         '*/*' AS "Accept",
         {HOST_SQL} AS "Host",
         'curl/7.47.0' AS "User-Agent"
  FROM events
)
"""

VALID_FILTER = "event_type IN ('sword_event', 'guild_event')"


def _raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.generator import load_kafka_records

    return load_kafka_records(spark, sf_dir)


def _valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.ingest import validate_events

    return validate_events(_raw(spark, sf_dir))


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .sources.tables import load_table

    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference parity — the Presto query surface (SURVEY.md §2.4) over the
# validated event pipeline (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@query(
    "ref_count",
    oracle="SELECT COUNT(*) AS num_entries FROM events",
)
def ref_count(spark, sf_dir):
    """OP-Q-COUNT — count(*) over the events table (README.md:622-631)."""
    from . import analytics

    return analytics.count_events(_table(spark, sf_dir, "events"))


@query(
    "ref_valid_count",
    oracle=f"{MAPPED_CTE} SELECT COUNT(*) AS num_entries FROM mapped WHERE {VALID_FILTER}",
)
def ref_valid_count(spark, sf_dir):
    """count(*) over the validated pipeline output — the reference's golden
    count check (README.md:741-771)."""
    from . import analytics

    return analytics.count_events(_valid(spark, sf_dir))


@query(
    "ref_groupby_direction",
    oracle=(
        f"{MAPPED_CTE} SELECT direction, COUNT(*) AS num_events "
        f"FROM mapped WHERE {VALID_FILTER} GROUP BY direction"
    ),
)
def ref_groupby_direction(spark, sf_dir):
    """OP-Q-GROUPBY-1 (README.md:657-668)."""
    from . import analytics

    return analytics.events_by(_valid(spark, sf_dir), "direction")


@query(
    "ref_groupby_host_type",
    oracle=(
        f'{MAPPED_CTE} SELECT "Host" AS host, event_type, COUNT(*) AS num_events '
        f"FROM mapped WHERE {VALID_FILTER} GROUP BY 1, 2"
    ),
)
def ref_groupby_host_type(spark, sf_dir):
    """OP-Q-GROUPBY-2 (README.md:776-791) — 2-col group-by + sort (sort is
    presentation-only; the compare is order-insensitive)."""
    from . import analytics

    return analytics.events_by_host_and_type(_valid(spark, sf_dir))


@query(
    "ref_distinct_host_type_detail",
    oracle=(
        f'{MAPPED_CTE} SELECT DISTINCT "Host" AS host, event_type, event_detail '
        f"FROM mapped WHERE {VALID_FILTER}"
    ),
)
def ref_distinct_host_type_detail(spark, sf_dir):
    """OP-Q-DISTINCT-3 (README.md:793-816)."""
    from . import analytics

    return analytics.distinct_host_type_detail(_valid(spark, sf_dir))


@query(
    "ref_limit10",
    oracle=(
        "SELECT event_id, user_id, event_type, value, props "
        "FROM events ORDER BY event_id LIMIT 10"
    ),
)
def ref_limit10(spark, sf_dir):
    """OP-Q-LIMIT (README.md:636-651), deterministic via unique-key ORDER BY
    (TakeOrderedAndProject — per-partition top-n, no global sort)."""
    from . import analytics

    ev = _table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    return analytics.first_events(ev, "event_id", 10)


@query(
    "ref_flatten",
    oracle=(
        f"{MAPPED_CTE} SELECT "
        "'{' || '\"event_type\":\"' || event_type || '\",' "
        "|| '\"direction\":\"' || direction || '\",' "
        "|| '\"event_detail\":\"' || event_detail || '\",' "
        "|| '\"Accept\":\"*/*\",' "
        "|| '\"Host\":\"' || \"Host\" || '\",' "
        "|| '\"User-Agent\":\"curl/7.47.0\"}' AS raw_event, "
        'event_type, direction, event_detail, "Accept", "Host", "User-Agent" '
        f"FROM mapped WHERE {VALID_FILTER}"
    ),
)
def ref_flatten(spark, sf_dir):
    """The canonical pipeline's flattened valid_events rows (OP-CAST +
    OP-FILTER + OP-JSON-PARSE + OP-FLATTEN, README.md:382-411), raw payload
    retained alongside parsed columns (README.md:636-651)."""
    v = _valid(spark, sf_dir)
    return v.select(
        "raw_event",
        "event_type",
        "direction",
        "event_detail",
        "Accept",
        "Host",
        "`User-Agent`",
    )


@query(
    "ref_filter_udf_parity",
    oracle=(
        f"{MAPPED_CTE} SELECT event_type, COUNT(*) AS num_events "
        f"FROM mapped WHERE {VALID_FILTER} GROUP BY event_type"
    ),
)
def ref_filter_udf_parity(spark, sf_dir):
    """OP-FILTER-UDF-BOOL — the reference's exact dataflow (Python UDF filter
    on raw bytes, THEN parse — write_swords_stream.py:53-58). Slow path, kept
    for API parity; must agree with the native path."""
    from pyspark.sql import functions as F

    from .operators.ingest import validate_events_udf_path

    return (
        validate_events_udf_path(_raw(spark, sf_dir))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("num_events"))
    )


@query(
    "ref_classify",
    oracle=(
        "SELECT CASE WHEN event_type IN ('purchase_sword', 'sword_event') THEN 1 "
        "WHEN event_type IN ('join_guild', 'guild_event') THEN 2 ELSE 3 END "
        "AS event_class, COUNT(*) AS num_events "
        f"FROM ({MAPPED_CTE} SELECT event_type FROM mapped) GROUP BY 1"
    ),
)
def ref_classify(spark, sf_dir):
    """OP-CLASSIFY-UDF-INT (rpg_spark_stream.py:31-40) as a native
    when/otherwise chain; counts per class over ALL events."""
    from pyspark.sql import functions as F

    from .operators.classify import classify_event_type_col
    from .operators.ingest import parse_events

    parsed = parse_events(_raw(spark, sf_dir))
    return parsed.groupBy(
        classify_event_type_col("event_type").alias("event_class")
    ).agg(F.count(F.lit(1)).alias("num_events"))


@query(
    "ref_infer",
    oracle=(
        f"{MAPPED_CTE} SELECT event_type, event_detail, COUNT(*) AS num_events "
        "FROM mapped GROUP BY 1, 2"
    ),
)
def ref_infer(spark, sf_dir):
    """OP-INFER — dynamic JSON schema inference (filtered_writes.py:39-42):
    schema-on-read over the raw payloads, then group-by on inferred columns.
    Default events lack event_detail in their JSON -> null after inference."""
    from pyspark.sql import functions as F

    from .operators.ingest import infer_parse_events

    inferred = infer_parse_events(_raw(spark, sf_dir))
    if "event_detail" not in inferred.columns:
        inferred = inferred.withColumn("event_detail", F.lit(None).cast("string"))
    return inferred.groupBy("event_type", "event_detail").agg(
        F.count(F.lit(1)).alias("num_events")
    )
