import sys, time
import __spark_entry__ as e
from user_behavior_spark_pipeline_spark.session import get_spark
from tests.oracle_utils import duckdb_connection, assert_frames_match

only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
spark = get_spark(app_name="verify")
spark.sparkContext.setLogLevel("ERROR")
if only is None:
    print("entry rows:", len(e.entry(spark).collect()), flush=True)
con = duckdb_connection("/root/testdata/sf0.01")
t0 = time.time()
fails = []
for name, sql in e.oracle_sql().items():
    if only is not None and name not in only:
        continue
    try:
        spdf = e.queries()[name](spark, "/root/testdata/sf0.01").toPandas()
        assert_frames_match(spdf, con.execute(sql).df(), name)
        print("OK", name, round(time.time() - t0, 1), flush=True)
    except Exception as ex:
        fails.append(name)
        print("FAIL", name, repr(ex)[:300], flush=True)
print("DONE fails=", fails, flush=True)
spark.stop()
sys.exit(1 if fails else 0)
