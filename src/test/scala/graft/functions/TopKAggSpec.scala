package graft.functions

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The typed top-k Aggregator: buffer algebra at the unit level, and the
  * full query's agreement with the window-sort formulation plus its
  * partial-aggregate plan shape. */
class TopKAggSpec extends SparkSpec {

  private val agg = new TopKAgg(3)

  test("reduce keeps at most k, ordered by (score desc, id asc)") {
    val in = Seq(Scored(1.0, 5), Scored(9.0, 1), Scored(4.0, 2),
      Scored(9.0, 0), Scored(4.0, 7))
    val out = in.foldLeft(agg.zero)(agg.reduce)
    out shouldBe Seq(Scored(9.0, 0), Scored(9.0, 1), Scored(4.0, 2))
  }

  test("merge is order-insensitive and respects the bound") {
    val xs = Seq(Scored(3.0, 1), Scored(8.0, 2), Scored(5.0, 3))
    val ys = Seq(Scored(7.0, 4), Scored(8.0, 0), Scored(1.0, 5))
    val a = xs.foldLeft(agg.zero)(agg.reduce)
    val b = ys.foldLeft(agg.zero)(agg.reduce)
    agg.merge(a, b) shouldBe agg.merge(b, a)
    agg.merge(a, b) shouldBe Seq(Scored(8.0, 0), Scored(8.0, 2), Scored(7.0, 4))
  }

  test("groups smaller than k return the whole group") {
    agg.reduce(agg.zero, Scored(2.0, 9)) shouldBe Seq(Scored(2.0, 9))
  }

  test("q_topk_typed_agg equals the window-sort formulation") {
    val got = Registry.byName("q_topk_typed_agg").run(spark, sfDir).collect()
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val supplier = spark.read.parquet(s"$sfDir/supplier.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    val want = lineitem
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_extendedprice").as("score"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("nation"))
          .orderBy(col("score").desc, col("item_id"))).cast("long"))
      .filter(col("rank") <= 3)
      .select("nation", "rank", "score", "item_id")
      .orderBy("nation", "rank")
      .collect()
    got should contain theSameElementsInOrderAs want
  }

  test("plan aggregates (ObjectHashAggregate) instead of window-sorting the fact rows") {
    val plan = Registry.byName("q_topk_typed_agg").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should include("ObjectHashAggregate")
    plan should not include "Window"
  }
}
