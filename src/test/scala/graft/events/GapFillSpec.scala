package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics checks for the time-series completion operators: spine
  * density/zero-fill and forward-fill carry semantics. */
class GapFillSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("e5_time_spine_gapfill: dense grid = hours × types, zero-filled holes") {
    val df = run("e5_time_spine_gapfill")
    val events = EventAnalytics.events(spark, sfDir)
    val nTypes = events.select("event_type").distinct().count()
    val Array(lo, hi) = events
      .agg(date_trunc("hour", min(col("ts"))), date_trunc("hour", max(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[java.sql.Timestamp]).toArray
    val nHours = (hi.getTime - lo.getTime) / 3600000L + 1
    df.count() shouldBe nTypes * nHours
    // zero-filled rows exist (the sf0.001 events table is sparse per type-hour)
    df.filter(col("n_events") === 0).count() should be > 0L
    // and their sums are exactly zero, not null
    df.filter(col("n_events") === 0)
      .filter(col("sum_value") =!= 0.0).count() shouldBe 0L
    // total event count is preserved by the left join
    df.agg(sum("n_events")).collect()(0).getLong(0) shouldBe events.count()
  }

  test("e5_forward_fill: carries the most recent purchase value per user") {
    val df = run("e5_forward_fill").cache()
    try {
      val events = EventAnalytics.events(spark, sfDir).cache()
      // spot-check every user's LAST row: fill == value of their last purchase
      val lastPurchase = events.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("want"))
      val lastRow = df
        .groupBy("user_id")
        .agg(max_by(col("last_purchase_value"), col("event_id")).as("got"))
      val joined = lastPurchase.join(lastRow, "user_id")
      joined.filter(col("want") =!= col("got")).count() shouldBe 0L
      // rows before a user's first purchase are NULL
      val firstPurchase = events.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(struct(col("ts"), col("event_id"))).as("fp"))
      val withFp = events.join(firstPurchase, Seq("user_id"), "left")
        .filter(col("fp").isNull ||
          struct(col("ts"), col("event_id")) < col("fp"))
        .select("event_id")
      df.join(withFp, "event_id")
        .filter(col("last_purchase_value").isNotNull).count() shouldBe 0L
    } finally df.unpersist()
  }
}
