import time
import __spark_entry__ as e
from user_behavior_spark_pipeline_spark.session import get_spark
from tests.oracle_utils import duckdb_connection, assert_frames_match

spark = get_spark(app_name="probe")
spark.sparkContext.setLogLevel("ERROR")
con = duckdb_connection("/root/testdata/sf0.01")
names = ["x_join_tpch_q15", "x_join_tpch_q16", "x_join_tpch_q17",
         "x_join_tpch_q19", "x_sample_reservoir"]
for name in names:
    t0 = time.time()
    df = e.queries()[name](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(name, "BNLJ:", "BroadcastNestedLoopJoin" in plan,
          "CART:", "CartesianProduct" in plan,
          "NullAware:", "NullAwareAntiJoin" in plan or "true" in plan and name=="x_join_tpch_q16",
          flush=True)
    if name == "x_join_tpch_q16":
        print(plan[:3000])
    assert_frames_match(df.toPandas(), con.execute(e.oracle_sql()[name]).df(), name)
    print("OK", name, round(time.time()-t0, 1), flush=True)
spark.stop()
print("ALL GREEN")
