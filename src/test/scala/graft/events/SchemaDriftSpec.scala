package graft.events

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The sfDir physical schema is DRIVER-OWNED and has already moved once
  * under the engine (round 10: events.ts shipped as parquet
  * timestamp[ns] through round 9, then regenerated as timestamp[us]
  * with isAdjustedToUTC=false — surfacing as TIMESTAMP_NTZ — which
  * broke every unix_micros-based event query at the driver gate). Pin
  * [[EventAnalytics.events]]'s normalization across every
  * representation the testdata has shipped, so the NEXT regeneration
  * is caught by `sbt test` instead of the round's correctness run. */
class SchemaDriftSpec extends SparkSpec {

  // three events, micro-second precise, one with a null props
  private val rows = Seq(
    (1L, 1700000000000000L, 7L, "click", 1.5, """{"k":1}"""),
    (2L, 1700000000123456L, 8L, "purchase", 2.5, """{"k":2}"""),
    (3L, 1700003600000000L, 7L, "view", 0.0, null: String))

  /** Write the same rows with `ts` in the given physical shape into a
    * scratch dir laid out like an sfDir, and read back via events(). */
  private def roundtrip(tag: String)(shape: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val dir = s"${sys.props("java.io.tmpdir")}/graft_evdrift_$tag"
    rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), shape(col("ts_us")).as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    EventAnalytics.events(spark, dir)
  }

  test("events() normalizes long-nanos, NTZ, and LTZ ts to one TimestampType frame") {
    // the three physical shapes the testdata has shipped (or could):
    //  - raw int64 nanos (what nanosAsLong surfaced for timestamp[ns])
    //  - TIMESTAMP_NTZ   (timestamp[us], isAdjustedToUTC = false)
    //  - TimestampType   (timestamp[us], isAdjustedToUTC = true)
    val variants = Map(
      "nanos" -> roundtrip("nanos")(us => (us * lit(1000L)).cast(LongType)),
      "ntz" -> roundtrip("ntz")(us => timestamp_micros(us).cast(TimestampNTZType)),
      "ltz" -> roundtrip("ltz")(us => timestamp_micros(us)))
    variants.foreach { case (tag, df) =>
      withClue(s"variant $tag: ") {
        df.schema("ts").dataType shouldBe TimestampType
      }
    }
    val collected = variants.map { case (tag, df) =>
      tag -> df.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val expected = rows.map(r => (r._1, r._2)).sortBy(_._1)
    collected.foreach { case (tag, got) =>
      withClue(s"variant $tag: ") { got shouldBe expected }
    }
  }

  test("the real sfDir events table normalizes and is unix_micros-queryable") {
    // whatever physical type the CURRENT driver testdata carries, the
    // normalized frame must answer the exact query family that broke
    val ev = EventAnalytics.events(spark, sfDir)
    ev.schema("ts").dataType shouldBe TimestampType
    val n = ev.select(unix_micros(col("ts")).as("us"))
      .filter(col("us") > 0L).count()
    n should be > 0L
  }

  override protected def afterAll(): Unit = {
    Seq("nanos", "ntz", "ltz").foreach { tag =>
      val p = java.nio.file.Paths.get(
        s"${sys.props("java.io.tmpdir")}/graft_evdrift_$tag")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    super.afterAll()
  }
}
