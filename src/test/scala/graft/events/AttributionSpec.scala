package graft.events

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Linear attribution semantics: every attributable purchase's value is
  * conserved — split exactly (to the decimal share's precision) across
  * its window clicks — and purchases with no prior-7d click attribute
  * nothing. */
class AttributionSpec extends SparkSpec {

  private case class Ev(id: Long, user: Long, tpe: String, tsMicros: Long, value: Double)

  private def evs(): Seq[Ev] =
    EventAnalytics.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000,
        r.getDouble(4)))
      .toSeq

  private val weekMicros = 7L * 24 * 3600 * 1000000L

  test("e5_linear_attribution conserves each attributable purchase's value") {
    val all = evs()
    val clicks = all.filter(_.tpe == "click")
    val attributableTotal = all.filter(_.tpe == "purchase").flatMap { p =>
      val touches = clicks.count(c =>
        c.user == p.user && c.tsMicros <= p.tsMicros &&
          c.tsMicros > p.tsMicros - weekMicros)
      if (touches == 0) None
      else {
        // the query's share discipline: trunc(value/n * 1e8), n of them
        val shareQ = (p.value / touches * 1e8).toLong
        Some(shareQ.toDouble * touches / 1e8)
      }
    }.sum
    val attributed = Registry.byName("e5_linear_attribution").run(spark, sfDir)
      .agg(sum(col("attributed"))).collect()(0).getDouble(0)
    attributed shouldBe attributableTotal +- 1e-6
  }

  test("per-click attribution matches a driver-side reference") {
    val all = evs()
    val clicks = all.filter(_.tpe == "click")
    val want = scala.collection.mutable.Map[(Long, Long), (BigInt, Set[Long])]()
    for (p <- all.filter(_.tpe == "purchase")) {
      val touched = clicks.filter(c =>
        c.user == p.user && c.tsMicros <= p.tsMicros &&
          c.tsMicros > p.tsMicros - weekMicros)
      if (touched.nonEmpty) {
        val shareQ = BigInt((p.value / touched.size * 1e8).toLong)
        for (c <- touched) {
          val k = (c.user, c.id)
          val (s0, ps) = want.getOrElse(k, (BigInt(0), Set.empty[Long]))
          want(k) = (s0 + shareQ, ps + p.id)
        }
      }
    }
    val got = Registry.byName("e5_linear_attribution").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    got.keySet shouldBe want.keySet.toSet
    got.foreach { case (k, (attr, n)) =>
      attr shouldBe (want(k)._1.toDouble / 1e8) +- 1e-9
      n shouldBe want(k)._2.size.toLong
    }
  }
}
