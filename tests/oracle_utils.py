"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

The driver sorts result columns by name, then value-hashes the row multiset.
We replicate with a slightly friendlier diff: sort columns by name, sort rows,
exact compare for non-floats, tight tolerance for floats (queries are designed
so floats are either raw parquet values — bit-identical in both engines — or
integerized aggregates, so exact equality is the expectation).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from user_behavior_spark_pipeline_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if df.empty:
        return df.reset_index(drop=True)
    # stable row order: stringify every cell, sort by the full tuple
    key = df.astype(str).agg("\x1f".join, axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def _type_class(series: pd.Series) -> str:
    """Coarse value-type class for driver-hash parity.

    The driver hashes typed values, so DuckDB HUGEINT (SUM over BIGINT →
    decimal128 → python Decimal) vs Spark int64 hash-differently even when
    numerically equal — the round-1 failure class. Classify each column so
    that mismatch fails loudly in local tests too.
    """
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    non_null = series.dropna()
    if non_null.empty:
        return "empty"
    import datetime
    import decimal

    v = non_null.iloc[0]
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    return type(v).__name__


# Value-type classes the driver's pandas canonicalizer can sort and hash.
# Anything else (list/ndarray/dict from array- or struct-typed columns) makes
# the DRIVER raise "unhashable type" before comparing — r02's only failure
# (x_multimodal_decode_q). Enforced here so local tests catch it first.
_DRIVER_HASHABLE = {
    "int", "float", "bool", "str", "datetime", "date", "decimal", "empty",
    "bytes",
}


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    for side, pdf in (("spark", spark_pdf), ("oracle", oracle_pdf)):
        for col in pdf.columns:
            tc = _type_class(pdf[col])
            assert tc in _DRIVER_HASHABLE, (
                f"{name}.{col} ({side}): cell type {tc!r} is not "
                "driver-hashable — the driver's canonicalizer fails on "
                "non-scalar cells; explode or stringify the column"
            )
    for col in spark_pdf.columns:
        sc, oc = _type_class(spark_pdf[col]), _type_class(oracle_pdf[col])
        assert sc == oc or "empty" in (sc, oc), (
            f"{name}.{col}: type-class mismatch spark={sc} oracle={oc} "
            f"(spark dtype={spark_pdf[col].dtype}, oracle dtype="
            f"{oracle_pdf[col].dtype}) — the driver's value hash will differ "
            "even if values are equal; align the oracle SQL output type "
            "(e.g. CAST(SUM(...) AS BIGINT))"
        )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
                a_null = a is None or (isinstance(a, float) and math.isnan(a))
                b_null = b is None or (isinstance(b, float) and math.isnan(b))
                assert a_null == b_null, f"{name}.{col}[{i}]: {a!r} != {b!r}"
                continue
            if isinstance(a, float) or isinstance(b, float):
                assert math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}.{col}[{i}]: {a!r} != {b!r}"
                )
            else:
                assert str(a) == str(b), f"{name}.{col}[{i}]: {a!r} != {b!r}"
