package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the deployment-time co-location strategy for the
  * orders⋈lineitem fact-fact edge (SURVEY.md §2.3, Relational header):
  * both tables bucketed by the join key join WITHOUT a shuffle on either
  * side. This spec proves the property on the actual plan — at 100 TB the
  * same DDL removes the dominant exchange from every orders⋈lineitem
  * query. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join runs with zero Exchange operators") {
    // warehouse dir is set (static conf) in SparkSpec: /tmp/graft_warehouse
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // disable auto-broadcast so the test proves co-location, not broadcast
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: the join itself needs no shuffle on either side
      val joinSection = plan.split("HashAggregate").last
      joinSection should include("SortMergeJoin")
      joinSection should not include "Exchange"

      // and the answer matches the plain (shuffling) join
      val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .join(spark.read.parquet(s"$sfDir/orders.parquet"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      joined.as[(String, Long)].collect().toMap shouldBe expected
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
