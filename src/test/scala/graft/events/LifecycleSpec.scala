package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics checks for the lifecycle wave: SCD2 history validity and
  * median/MAD anomaly-flag invariants. */
class LifecycleSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("e5_scd2_activity_tiers: per-user histories are non-overlapping, ordered, tier-alternating") {
    val rows = run("e5_scd2_activity_tiers").collect()
    rows.foreach { r =>
      // a run's bounds are sane and its day count fits inside them
      val from = r.getAs[java.sql.Date]("valid_from")
      val to = r.getAs[java.sql.Date]("valid_to")
      from.compareTo(to) should be <= 0
      val spanDays = (to.toLocalDate.toEpochDay - from.toLocalDate.toEpochDay) + 1
      r.getAs[Long]("n_days") should be <= spanDays
    }
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, hs) =>
      val sorted = hs.sortBy(_.getAs[java.sql.Date]("valid_from").toLocalDate.toEpochDay)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // islands never overlap, and adjacent islands differ in tier
          // (equal-tier neighbors would have been one island)
          a.getAs[java.sql.Date]("valid_to").toLocalDate.toEpochDay should be <
            b.getAs[java.sql.Date]("valid_from").toLocalDate.toEpochDay
          a.getAs[String]("tier") should not be b.getAs[String]("tier")
        case _ => ()
      }
    }
  }

  test("e5_scd2_activity_tiers: event totals are conserved across the history") {
    val total = run("e5_scd2_activity_tiers")
      .agg(sum("n_events")).head().getLong(0)
    val expected = EventAnalytics.events(spark, sfDir).count()
    total shouldBe expected
  }

  test("e5_point_in_time_lookup: every purchase resolves to exactly one SCD2 run") {
    val purchases = EventAnalytics.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
    val out = run("e5_point_in_time_lookup").collect()
    out.length shouldBe purchases.count() // bijection: no drops, no fan-out
    out.map(_.getLong(0)).distinct.length shouldBe out.length
    // the looked-up tier is the run containing the purchase day
    val hist = run("e5_scd2_activity_tiers").collect()
      .map(r => (r.getLong(0), r.getDate(2), r.getDate(3), r.getString(1)))
    val byUser = hist.groupBy(_._1)
    out.take(200).foreach { r =>
      val (user, day, tier) = (r.getLong(1), r.getDate(2), r.getString(3))
      val runs = byUser(user).filter(h =>
        !day.before(h._2) && !day.after(h._3))
      runs.length shouldBe 1 // runs are disjoint calendar intervals
      runs.head._4 shouldBe tier
    }
  }

  test("e5_daily_anomaly_mad: one row per (type, day); anomaly iff |n - med| > 3*mad") {
    val rows = run("e5_daily_anomaly_mad").collect()
    rows.map(r => (r.getString(0), r.get(1))).distinct.length shouldBe rows.length
    rows.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val med = r.getAs[Double]("med")
      val mad = r.getAs[Double]("mad")
      r.getAs[Boolean]("is_anomaly") shouldBe math.abs(n - med) > 3.0 * mad
    }
    // medians are per-type: every type's med must be attained-or-bracketed
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val ns = g.map(_.getAs[Long]("n").toDouble).sorted
      val med = g.head.getAs[Double]("med")
      med should be >= ns.head
      med should be <= ns.last
    }
  }
}
