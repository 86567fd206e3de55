"""Z-order layout: the footer-stats locality property that makes the key
worth sorting by — z-sorted files must bound BOTH dimensions tighter than
single-column-sorted files bound the other dimension."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from user_behavior_spark_pipeline_spark.operators.layout import zorder_key
from user_behavior_spark_pipeline_spark.sources.tables import load_table


def _per_file_spread(path_glob: str, cols: tuple[str, str]) -> float:
    """Sum over files of the normalized (max-min) spread of both columns —
    smaller = better file-skipping for predicates on those columns."""
    total = 0.0
    files = glob.glob(path_glob)
    assert files
    for f in files:
        meta = pq.read_metadata(f)
        for ci in range(meta.num_columns):
            name = meta.schema.column(ci).name
            if name not in cols:
                continue
            lo, hi = None, None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(ci).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            total += float(hi - lo)
    return total


def test_zorder_sorted_files_bound_both_dimensions(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("ck"),
        (F.floor(F.col("o_totalprice") / 500).cast("long") % 1024).alias("pb"),
    )
    n_files = 8
    naive = str(tmp_path / "naive")
    # single-column layout: clusters ck, leaves pb unconstrained per file
    orders.repartitionByRange(n_files, "ck").write.parquet(naive)
    zsorted = str(tmp_path / "zsorted")
    with_z = orders.withColumn("z", zorder_key(F.col("ck"), F.col("pb")))
    with_z.repartitionByRange(n_files, "z").sortWithinPartitions(
        "z"
    ).drop("z").write.parquet(zsorted)
    naive_spread = _per_file_spread(naive + "/*.parquet", ("ck", "pb"))
    z_spread = _per_file_spread(zsorted + "/*.parquet", ("ck", "pb"))
    # z-layout must strictly improve the combined two-dimension locality
    assert z_spread < naive_spread
