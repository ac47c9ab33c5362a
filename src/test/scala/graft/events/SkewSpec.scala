package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** The salted shuffle join must be a pure plan rewrite: same rows as the
  * straightforward broadcast join, but with the (key, salt) composite
  * spreading each low-cardinality key over `salts` reducers. */
class SkewSpec extends SparkSpec {

  test("e5_skew_salted_join: plan is a shuffled hash join keyed on (event_type, salt)") {
    val plan = Registry.byName("e5_skew_salted_join")
      .run(spark, sfDir).queryExecution.executedPlan.toString
    plan should include("ShuffledHashJoin")
    plan should not include "BroadcastHashJoin"
    plan should include regex """hashpartitioning\(event_type#\d+, salt"""
  }

  test("e5_skew_salted_join: identical result to the unsalted broadcast join") {
    val salted = Registry.byName("e5_skew_salted_join").run(spark, sfDir)
    import spark.implicits._
    val dim = Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
      ("signup", 5.0), ("error", 0.0)).toDF("event_type", "weight")
    val direct = EventAnalytics.events(spark, sfDir)
      .join(broadcast(dim), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (graft.T.dsum(col("value")) * min(col("weight"))).as("weighted_value"))
      .orderBy(col("event_type"))
    salted.collect().toSeq shouldBe direct.collect().toSeq
  }
}
