package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

class RollingSpec extends SparkSpec {

  test("e5_activity_streaks: islands partition the active days; longest run verified per user") {
    val out = Registry.byName("e5_activity_streaks").run(spark, sfDir).collect()
    out should not be empty

    // independent recomputation: per user, walk the sorted distinct days
    // (as epoch-day longs) and measure runs directly — spec scale only
    val days = EventAnalytics.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap

    out.foreach { r =>
      val (user, nActive, nStreaks, maxLen) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val ds = days(user)
      nActive shouldBe ds.size.toLong
      // runs via fold: (runStartEpochDay, length), newest first
      val runs = ds.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, d) => List((d, 1L))
        case ((start, len) :: rest, d) =>
          if (d - start == len) (start, len + 1) :: rest
          else (d, 1L) :: (start, len) :: rest
      }
      assert(nStreaks == runs.size.toLong)
      maxLen shouldBe runs.map(_._2).max
      // best_streak_start is the EARLIEST start among the longest runs
      val best = runs.filter(_._2 == maxLen).map(_._1).min
      r.getString(4) shouldBe java.time.LocalDate.ofEpochDay(best).toString
    }
  }

  test("e5_sliding_window_counts: every event lands in exactly 4 overlapping windows") {
    val out = Registry.byName("e5_sliding_window_counts").run(spark, sfDir)
    val totalAssigned = out.agg(sum(col("n_events"))).head.getLong(0)
    val nEvents = EventAnalytics.events(spark, sfDir).count()
    totalAssigned shouldBe 4 * nEvents // 1h window / 15min slide = x4 fan-out

    // window starts are on the 15-minute grid
    val offGrid = out.filter(
      minute(to_timestamp(col("window_start"), "yyyy-MM-dd HH:mm")) % 15 =!= 0)
    offGrid.count() shouldBe 0L
  }

  test("e5_rolling_dau_wau: spine is dense, WAU bounds DAU, and WAU equals a direct range count") {
    val rows = Registry.byName("e5_rolling_dau_wau").run(spark, sfDir).collect()
    rows should not be empty
    // dense day spine: consecutive dates, no holes
    val ds = rows.map(r => java.time.LocalDate.parse(r.getString(0)))
    ds.sliding(2).foreach {
      case Array(a, b) => b.toEpochDay - a.toEpochDay shouldBe 1L
      case _           =>
    }
    rows.foreach { r =>
      r.getLong(2) should be >= r.getLong(1) // wau >= dau
      r.getDouble(3) should (be >= 0.0 and be <= 1.0)
    }
    // direct (inefficient) recomputation of WAU for the last day: distinct
    // users active in [day-6, day]
    val last = ds.max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val expectWau = EventAnalytics.events(spark, sfDir)
      .filter(to_date(col("ts")).between(
        lit(last.minusDays(6).toString).cast("date"), lit(last.toString).cast("date")))
      .select(col("user_id")).distinct().count()
    rows.find(_.getString(0) == last.toString).get.getLong(2) shouldBe expectWau
  }
}
