"""Parquet footer probe (operators/lake): pyarrow-backed metadata-only
reads, codec/row-group closed form, quarantine."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.lake import (
    parquet_footer,
    parquet_footers,
    synth_parquet_bytes,
    synth_parquet_media,
)


def test_footer_closed_form_and_sizes():
    for did in range(8):
        d = parquet_footer(synth_parquet_bytes(did))
        n = did % 5 + 1
        assert d["n_rows"] == n and d["n_columns"] == 3
        assert d["n_row_groups"] == -(-n // 2)
        assert d["codec"] == ["UNCOMPRESSED", "SNAPPY", "GZIP", "ZSTD",
                              "LZ4"][did % 5]
        assert d["compressed_bytes"] > 0
        assert d["uncompressed_bytes"] >= 0


def test_footer_rejections_and_operator(spark):
    with pytest.raises(ValueError, match="corrupt Parquet"):
        parquet_footer(b"PAR1 not really a parquet file PAR1")
    with pytest.raises(ValueError, match="corrupt Parquet"):
        parquet_footer(synth_parquet_bytes(1)[:-10])
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    rows = {r.media_id: r for r in parquet_footers(synth_parquet_media(docs)).collect()}
    for i in range(4):
        assert rows[i].parse_error is None and rows[i].n_rows == i % 5 + 1
    from user_behavior_spark_pipeline_spark.operators.multimodal import (
        sniff_media_type,
    )

    assert sniff_media_type(synth_parquet_bytes(2)) == "parquet"
