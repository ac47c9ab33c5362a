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
}
