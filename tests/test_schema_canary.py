"""Testdata schema-drift canary.

The driver REGENERATES /root/testdata between rounds and has already
changed a physical type once (events.ts: TIMESTAMP(NANOS) in round 1 →
TIMESTAMP(MICROS)/NTZ in round 2), which silently broke 19 queries until
diagnosed. This canary pins the post-`load_table` schema of every table:
if a regeneration changes anything, the FIRST failing test of the round
names the table and the exact diff instead of queries failing obscurely
downstream.

If this fails after a regeneration: update EXPECTED below once the
loaders/queries have been adapted to the new shape — the canary's job is
to make the drift loud, not to forbid it.
"""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.sources.tables import TABLES, load_table

EXPECTED = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": "struct<c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string>",
    "supplier": "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part": "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double>",
    "orders": "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>",
    "lineitem": "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>",
    "events": "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,event_type:string,value:double,props:string>",
    "documents": "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_unchanged(spark, sf_dir, table):
    got = load_table(spark, sf_dir, table).schema.simpleString()
    assert got == EXPECTED[table], (
        f"TESTDATA DRIFT on {table!r}:\n  got      {got}\n"
        f"  expected {EXPECTED[table]}\n"
        "The driver regenerated the fixtures with a new shape — adapt "
        "sources/tables.py (and any affected queries), then update this "
        "canary."
    )


def test_documents_text_is_ascii_word_soup(spark, sf_dir):
    """x_multimodal_decode_q's oracle equates UTF-8 bytes with code points
    — valid only while the corpus is pure printable ASCII. Make that
    assumption loud."""
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    non_ascii = docs.filter(F.col("text").rlike("[^\\x20-\\x7e]")).count()
    assert non_ascii == 0, (
        f"{non_ascii} documents contain non-ASCII text; the "
        "x_multimodal_decode_q oracle (bytes == code points) no longer "
        "holds — switch its oracle to a byte-level reproduction."
    )
