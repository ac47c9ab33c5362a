package graft.functions

import graft.SparkSpec

/** RollingHashes' incremental recurrence vs the naive per-window fold,
  * on random strings (seeded): every window hash must match, proving
  * the rolling subtraction/mod arithmetic exactly reproduces the
  * window-by-window polynomial. */
class RollingHashPropertySpec extends SparkSpec {
  import spark.implicits._

  private val B = 257L
  private val M = 1000000007L
  private val W = 16

  private def naive(s: String): Seq[Long] =
    if (s.length < W) Seq.empty
    else (0 to s.length - W).map { i =>
      s.substring(i, i + W).codePoints().toArray
        .foldLeft(0L)((h, c) => (h * B + c) % M)
    }

  test("recurrence equals the naive fold on random strings (incl. unicode)") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "abc XYZ012,.éü漢" // multi-byte chars stress codePoints
      val strs = Seq.fill(20)(
        (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val viaExpr = strs.toDF("text")
        .select(TextFunctions.rollingHashes($"text", W, B, M))
        .as[Seq[Long]].collect().toSeq
      withClue(s"seed=$seed: ") { viaExpr shouldBe strs.map(naive) }
    }
  }
}
