package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

/** Randomized as-of join vs a straightforward in-memory reference: for
  * every left row, the right payload must equal the max-(ts, id) right
  * row at-or-before it within the key. Seeded generators keep runs
  * deterministic. */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(1700000000000L + ms)

  test("random instances match the in-memory reference join") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val keys = 1 to 4
      val right = (1 to 60).map { i =>
        (keys(rnd.nextInt(keys.size)).toLong, t(rnd.nextInt(1000) * 1000L), i.toLong,
          rnd.nextInt(100).toDouble)
      }
      val left = (101 to 160).map { i =>
        (keys(rnd.nextInt(keys.size)).toLong, t(rnd.nextInt(1000) * 1000L), i.toLong)
      }
      val out = AsOfJoin.backward(
        left.toDF("user_id", "ts", "event_id"),
        right.toDF("user_id", "ts", "event_id", "px"),
        "user_id", "ts", "event_id", Seq("px"))
        .select($"event_id", $"px".cast("string")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)).map(_.toDouble)).toMap

      val expected = left.map { case (k, ts, id) =>
        val matches = right.filter(r => r._1 == k && !r._2.after(ts))
        id -> (if (matches.isEmpty) None
               else Some(matches.maxBy(r => (r._2.getTime, r._3))._4))
      }.toMap

      withClue(s"seed=$seed: ") { out shouldBe expected }
    }
  }
}
