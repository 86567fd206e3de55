from user_behavior_spark_pipeline_spark.session import get_spark
from user_behavior_spark_pipeline_spark.sources.tables import load_table
from user_behavior_spark_pipeline_spark.operators.dedup import (
    embedding_near_dup_blocked,
    semantic_near_dup_pairs,
)

spark = get_spark(app_name="probe")
spark.sparkContext.setLogLevel("ERROR")
for sf in ("/root/testdata/sf0.01",):
    emb = load_table(spark, sf, "embeddings")
    exact = {
        (r["vec_id_1"], r["vec_id_2"])
        for r in embedding_near_dup_blocked(emb, 0.4).collect()
    }
    for nc in (8, 16, 32):
        sem = {
            (r["vec_id_1"], r["vec_id_2"])
            for r in semantic_near_dup_pairs(emb, 0.4, nc).collect()
        }
        extra = sem - exact
        print(
            sf, "nc=", nc, "exact=", len(exact), "sem=", len(sem),
            "recall=", round(len(sem & exact) / max(1, len(exact)), 3),
            "extra(not in exact)=", len(extra),
            flush=True,
        )
spark.stop()
