package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.Timestamp

/** Property tests: the single-shuffle window formulations of all three
  * as-of directions agree with a brute-force O(n·m) reference on random
  * fixtures dense in the hard cases (equal timestamps across and within
  * sides, null payload fields, keys present on one side only).
  * Seeded hand-rolled forAll — same pattern as ParitySpec. */
class AsOfJoinPropSpec extends SparkSpec {
  import spark.implicits._

  private case class R(key: Long, ts: Int, id: Long, px: Option[Double], venue: String)
  private case class L(key: Long, ts: Int, id: Long)

  private def t(s: Int) = Timestamp.from(java.time.Instant.ofEpochSecond(s.toLong))

  // small domains force collisions: 3 keys x 12 timestamps
  private val rightGen = Gen.listOfN(15, for {
    k <- Gen.choose(1L, 3L)
    ts <- Gen.choose(0, 11)
    px <- Gen.option(Gen.choose(1, 999).map(_.toDouble))
    v <- Gen.oneOf("lit", "dark", "mic")
  } yield (k, ts, px, v))
  private val leftGen = Gen.listOfN(10, for {
    k <- Gen.choose(1L, 4L) // key 4 never matches
    ts <- Gen.choose(0, 11)
  } yield (k, ts))

  private def fixtures(seed: Long): (Seq[L], Seq[R]) = {
    val r = rightGen(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case ((k, ts, px, v), i) => R(k, ts, 100L + i, px, v) }
    val l = leftGen(Gen.Parameters.default, Seed(seed + 1000)).get
      .zipWithIndex.map { case ((k, ts), i) => L(k, ts, i.toLong) }
    (l, r)
  }

  // reference semantics: backward = max (ts, id) with ts <= lt;
  // forward = min (ts, id) with ts >= lt; nearest prefers backward on
  // equal distance (the operator's documented contract)
  private def back(l: L, rs: Seq[R]): Option[R] =
    rs.filter(r => r.key == l.key && r.ts <= l.ts)
      .sortBy(r => (r.ts, r.id)).lastOption
  private def fwd(l: L, rs: Seq[R]): Option[R] =
    rs.filter(r => r.key == l.key && r.ts >= l.ts)
      .sortBy(r => (r.ts, r.id)).headOption
  private def near(l: L, rs: Seq[R]): Option[R] = (back(l, rs), fwd(l, rs)) match {
    case (Some(b), Some(f)) =>
      if (l.ts - b.ts <= f.ts - l.ts) Some(b) else Some(f)
    case (b, f) => b.orElse(f)
  }

  private def run(dir: String, l: Seq[L], r: Seq[R]) = {
    val lf = l.map(x => (x.key, t(x.ts), x.id)).toDF("user_id", "ts", "event_id")
    val rf = r.map(x => (x.key, t(x.ts), x.id, x.px, x.venue))
      .toDF("user_id", "ts", "event_id", "px", "venue")
    val out = dir match {
      case "backward" => AsOfJoin.backward(lf, rf, "user_id", "ts", "event_id", Seq("px", "venue"))
      case "forward" => AsOfJoin.forward(lf, rf, "user_id", "ts", "event_id", Seq("px", "venue"))
      case "nearest" => AsOfJoin.nearest(lf, rf, "user_id", "ts", "event_id", Seq("px", "venue"))
    }
    out.collect().map { row =>
      row.getAs[Long]("event_id") ->
        (Option(row.getAs[java.lang.Double]("px")).map(_.doubleValue),
          Option(row.getAs[String]("venue")))
    }.toMap
  }

  test("backward/forward/nearest match the brute-force reference on random fixtures") {
    for (seed <- 1 to 12) {
      val (l, r) = fixtures(seed.toLong)
      val clue = s"seed=$seed left=$l right=$r: "
      def expect(pick: L => Option[R]) =
        l.map(x => x.id -> (pick(x).flatMap(_.px), pick(x).map(_.venue))).toMap
      withClue(clue + "backward ") {
        run("backward", l, r) shouldBe expect(back(_, r))
      }
      withClue(clue + "forward ") {
        run("forward", l, r) shouldBe expect(fwd(_, r))
      }
      withClue(clue + "nearest ") {
        run("nearest", l, r) shouldBe expect(near(_, r))
      }
    }
  }
}
