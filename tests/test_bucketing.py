"""Bucketed-table co-location: a join between two tables bucketed on the
join key runs WITHOUT a shuffle — the physical pattern that makes repeated
entity-keyed joins cheap at 100 TB (write once bucketed, join many times)."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and the database is dropped in the finally block
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")

    a = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 10_000).withColumn("w", F.col("id") + 1)
    for name, df in [("ta", a), ("tb", b)]:
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(8, "id").sortBy("id")
         .saveAsTable(f"bktest.{name}"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bktest.ta").join(spark.table("bktest.tb"), "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan      # co-located: bucket join, no shuffle
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP DATABASE bktest CASCADE")
