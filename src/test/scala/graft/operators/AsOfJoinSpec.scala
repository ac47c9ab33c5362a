package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Backward as-of join semantics on handcrafted fixtures (the registered
  * e5_asof query covers the oracle equivalence at scale). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("picks the latest right row at-or-before each left row, per key") {
    val quotes = Seq( // key, ts, id, px
      (1L, t("2024-01-01 10:00:00"), 1L, 100.0),
      (1L, t("2024-01-01 10:05:00"), 2L, 101.0),
      (1L, t("2024-01-01 10:10:00"), 3L, 102.0),
      (2L, t("2024-01-01 10:07:00"), 4L, 200.0)
    ).toDF("user_id", "ts", "event_id", "px")
    val trades = Seq(
      (1L, t("2024-01-01 10:06:00"), 10L), // between quotes 2 and 3 -> 101
      (1L, t("2024-01-01 10:10:00"), 11L), // exactly at quote 3 -> 102 (ties match)
      (2L, t("2024-01-01 10:00:00"), 12L), // before any quote -> null
      (2L, t("2024-01-01 10:30:00"), 13L)  // -> 200
    ).toDF("user_id", "ts", "event_id")

    val out = AsOfJoin.backward(trades, quotes, "user_id", "ts", "event_id", Seq("px"))
      .select($"event_id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    out shouldBe Map(
      10L -> Some(101.0), 11L -> Some(102.0), 12L -> None, 13L -> Some(200.0))
  }

  test("keys never leak across partitions") {
    val right = Seq((1L, t("2024-01-01 00:00:00"), 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "px")
    val left = Seq((2L, t("2024-01-02 00:00:00"), 2L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.backward(left, right, "user_id", "ts", "event_id", Seq("px"))
    out.count() shouldBe 1L
    out.select($"px").head().isNullAt(0) shouldBe true
  }

  test("forward picks the earliest right row at-or-after each left row, per key") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, 100.0),
      (1L, t("2024-01-01 10:05:00"), 2L, 101.0),
      (2L, t("2024-01-01 10:07:00"), 4L, 200.0)
    ).toDF("user_id", "ts", "event_id", "px")
    val trades = Seq(
      (1L, t("2024-01-01 09:59:00"), 10L), // before both -> earliest = 100
      (1L, t("2024-01-01 10:05:00"), 11L), // exactly at quote 2 -> 101 (ties match)
      (1L, t("2024-01-01 10:06:00"), 12L), // after the last quote -> null
      (2L, t("2024-01-01 10:00:00"), 13L)  // -> 200
    ).toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.forward(trades, quotes, "user_id", "ts", "event_id", Seq("px"))
      .select($"event_id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    out shouldBe Map(
      10L -> Some(100.0), 11L -> Some(101.0), 12L -> None, 13L -> Some(200.0))
  }

  test("nearest picks the closer side, prefers backward on exact ties") {
    val quotes = Seq( // key, ts, id, px
      (1L, t("2024-01-01 10:00:00"), 1L, 100.0),
      (1L, t("2024-01-01 10:10:00"), 2L, 102.0),
      (2L, t("2024-01-01 12:00:00"), 3L, 200.0)
    ).toDF("user_id", "ts", "event_id", "px")
    val trades = Seq(
      (1L, t("2024-01-01 10:04:00"), 10L), // 4min back vs 6min fwd -> 100
      (1L, t("2024-01-01 10:06:00"), 11L), // 6min back vs 4min fwd -> 102
      (1L, t("2024-01-01 10:05:00"), 12L), // exact tie -> backward 100
      (1L, t("2024-01-01 10:10:00"), 13L), // dt=0 backward (>= semantics) -> 102
      (2L, t("2024-01-01 09:00:00"), 14L), // only a future quote -> 200
      (3L, t("2024-01-01 09:00:00"), 15L)  // no quotes for key -> null
    ).toDF("user_id", "ts", "event_id")

    val out = AsOfJoin.nearest(trades, quotes, "user_id", "ts", "event_id", Seq("px"))
      .select($"event_id", $"px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    out shouldBe Map(
      10L -> Some(100.0), 11L -> Some(102.0), 12L -> Some(100.0),
      13L -> Some(102.0), 14L -> Some(200.0), 15L -> None)
  }

  test("nearest carries the matched right ts and breaks equal-ts ties per side contract") {
    val quotes = Seq( // two quotes at the SAME ts: backward takes max id, forward min id
      (1L, t("2024-01-01 10:00:00"), 1L, 100.0),
      (1L, t("2024-01-01 10:00:00"), 2L, 101.0)
    ).toDF("user_id", "ts", "event_id", "px")
    val before = Seq((1L, t("2024-01-01 09:00:00"), 10L)).toDF("user_id", "ts", "event_id")
    val after = Seq((1L, t("2024-01-01 11:00:00"), 11L)).toDF("user_id", "ts", "event_id")
    // left BEFORE both quotes -> forward candidate -> min id (px 100)
    AsOfJoin.nearest(before, quotes, "user_id", "ts", "event_id", Seq("px"))
      .select($"px", $"ts_matched").head() match {
      case r => r.getDouble(0) shouldBe 100.0
        r.getTimestamp(1) shouldBe t("2024-01-01 10:00:00")
    }
    // left AFTER both quotes -> backward candidate -> max id (px 101)
    AsOfJoin.nearest(after, quotes, "user_id", "ts", "event_id", Seq("px"))
      .select($"px").head().getDouble(0) shouldBe 101.0
  }

  test("null payload fields are carried atomically from the matched row") {
    // the MATCHED quote has px = NULL: the output must keep that null and
    // take src from the same row — never stitch px from an older quote
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, Option(100.0), Option("mic")),
      (1L, t("2024-01-01 10:05:00"), 2L, Option.empty[Double], Option("dark"))
    ).toDF("user_id", "ts", "event_id", "px", "venue")
    val trades = Seq((1L, t("2024-01-01 10:06:00"), 10L))
      .toDF("user_id", "ts", "event_id")

    val b = AsOfJoin.backward(trades, quotes, "user_id", "ts", "event_id",
      Seq("px", "venue")).select($"px", $"venue").head()
    b.isNullAt(0) shouldBe true
    b.getString(1) shouldBe "dark"

    val n = AsOfJoin.nearest(trades, quotes, "user_id", "ts", "event_id",
      Seq("px", "venue")).select($"px", $"venue", $"ts_matched").head()
    n.isNullAt(0) shouldBe true
    n.getString(1) shouldBe "dark"
    n.getTimestamp(2) shouldBe t("2024-01-01 10:05:00")

    // forward mirror: trade before a null-px quote that precedes a non-null
    val earlyTrade = Seq((1L, t("2024-01-01 10:01:00"), 11L))
      .toDF("user_id", "ts", "event_id")
    val fwdQuotes = Seq(
      (1L, t("2024-01-01 10:02:00"), 3L, Option.empty[Double], Option("lit")),
      (1L, t("2024-01-01 10:09:00"), 4L, Option(103.0), Option("mic"))
    ).toDF("user_id", "ts", "event_id", "px", "venue")
    val f = AsOfJoin.forward(earlyTrade, fwdQuotes, "user_id", "ts", "event_id",
      Seq("px", "venue")).select($"px", $"venue").head()
    f.isNullAt(0) shouldBe true
    f.getString(1) shouldBe "lit"
  }
}
