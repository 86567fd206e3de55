import sys

import __spark_entry__ as e
from tests.oracle_utils import assert_frames_match, duckdb_connection
from user_behavior_spark_pipeline_spark.session import get_spark

spark = get_spark(app_name="probe")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_connection("/root/testdata/sf0.01")
for name in ("x_join_tpch_q13", "x_join_tpch_q22"):
    df = e.queries()[name](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(name, "BNLJ" in plan or "CartesianProduct" in plan and "CART", flush=True)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name
    if name == "x_join_tpch_q22":
        assert "LeftAnti" in plan, plan[:2000]
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    if name == "x_join_tpch_q13":
        ji = opt.index("Join LeftOuter")
        ai = opt.index("Aggregate [o_custkey")
        assert ji < ai, "orders must be pre-aggregated under the join"
    assert_frames_match(
        df.toPandas(), con.execute(e.oracle_sql()[name]).df(), name
    )
    print("OK", name, flush=True)
spark.stop()
print("ALL GREEN")
