package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("two-phase peak concurrency equals the single global running sum") {
    // recompute with the textbook single global window (fine at spec
    // scale) and compare per-hour peaks against the decomposed plan
    val out = Registry.byName("e5_peak_concurrency").run(spark, sfDir)
      .select("hour_bucket", "peak_concurrency")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = EventAnalytics.events(spark, sfDir)
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val deltas = sess
      .select(col("user_id"), col("session_id"), col("s_start").as("ts"), lit(1).as("delta"))
      .unionAll(sess.select(
        col("user_id"), col("session_id"), col("s_end").as("ts"), lit(-1).as("delta")))
    val wGlobal = Window
      .orderBy(col("ts"), col("delta").desc, col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = deltas
      .withColumn("conc", sum(col("delta")).over(wGlobal))
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour_bucket"))
      .agg(max(col("conc")).cast("long").as("peak"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    out shouldBe expected
    out.values.max should be >= 2L // the fixture actually overlaps sessions
  }

  test("concurrency starts and ends balance to zero") {
    val agg = Registry.byName("e5_peak_concurrency").run(spark, sfDir)
      .agg(sum(col("n_starts")).as("s"), sum(col("n_ends")).as("e"))
      .head()
    agg.getLong(0) shouldBe agg.getLong(1) // every opened session closes
  }

  test("transition probabilities sum to 1 per from-type and counts cover all pairs") {
    val t = Registry.byName("e5_event_transitions").run(spark, sfDir).cache()
    try {
      val sums = t.groupBy("from_type").agg(sum(col("p")).as("psum"))
        .collect().map(_.getDouble(1))
      sums should not be empty
      sums.foreach(_ shouldBe 1.0 +- 1e-9)
      // n_from is consistent with the pair counts it normalizes
      t.withColumn("tot",
        sum(col("n_pairs")).over(Window.partitionBy(col("from_type"))))
        .filter(col("n_from") =!= col("tot"))
        .count() shouldBe 0L
    } finally t.unpersist()
  }
}
