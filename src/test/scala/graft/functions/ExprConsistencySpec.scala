package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Every custom expression hand-writes BOTH an interpreted eval and a
  * doGenCode body. This spec runs the same inputs through the codegen
  * path (default) and the forced-interpreted path (CODEGEN_ONLY off via
  * factory mode NO_CODEGEN) and requires identical results — the class
  * of bug where one path is edited and the other forgotten. */
class ExprConsistencySpec extends SparkSpec {
  import spark.implicits._

  private def bothModes(build: => DataFrame): (Seq[String], Seq[String]) = {
    val conf = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(conf)
    val gen = build.collect().map(_.toString).toSeq
    spark.conf.set(conf, "NO_CODEGEN")
    try {
      val interp = build.collect().map(_.toString).toSeq
      (gen, interp)
    } finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }

  private val docs = Seq(
    "slow big dup hash scan and some more words to hash here",
    "a", // shorter than any window
    "", // empty
    "exactly sixteen.", // length 16 boundary
    "repeat repeat repeat repeat repeat")

  test("RollingHashes: codegen == interpreted, incl. short/empty strings") {
    val (g, i) = bothModes(docs.toDF("text")
      .select(TextFunctions.rollingHashes($"text", 16, 257L, 1000000007L)))
    g shouldBe i
  }

  test("SimHash64: codegen == interpreted") {
    val (g, i) = bothModes(docs.toDF("text")
      .select(TextFunctions.simhash64(split($"text", " "))))
    g shouldBe i
  }

  test("DotProduct + LshBuckets: codegen == interpreted") {
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val planes = Seq.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("v")
    val (g1, i1) = bothModes(df.select(VectorFunctions.dot($"v", $"v")))
    g1 shouldBe i1
    val (g2, i2) = bothModes(df.select(VectorFunctions.lshBuckets($"v", planes, 2, 4)))
    g2 shouldBe i2
  }

  test("DotProduct + LshBuckets: a null SLOT poisons the result (HOF semantics), both paths") {
    // element type is nullable here, so the slot-guard branch compiles in
    val df = Seq(
      Seq[java.lang.Double](1.0, null, 3.0),
      Seq[java.lang.Double](1.0, 2.0, 3.0)).toDF("v")
    val planes = Seq(Array(1.0, 1.0, 1.0), Array(1.0, -1.0, 1.0))
    val (g1, i1) = bothModes(df.select(VectorFunctions.dot($"v", $"v").as("d")))
    g1 shouldBe i1
    g1 shouldBe Seq("[null]", "[14.0]")
    val (g2, i2) = bothModes(df.select(
      VectorFunctions.lshBuckets($"v", planes, 1, 2).as("b")))
    g2 shouldBe i2
    g2.head shouldBe "[null]"
    g2(1) should not be "[null]"
  }

  test("VecIndexable: codegen == interpreted across the full verdict table") {
    // one row per contract clause: indexable, all-zero (round-14 nonzero
    // clause — a padding row has no direction), negative-zero-only
    // (−0.0 == 0.0: still zero-norm), single nonzero slot, NaN slot,
    // +Inf slot, null slot, empty, missing
    val df = Seq(
      Option(Seq[java.lang.Double](1.0, 2.0, 3.0)),
      Option(Seq[java.lang.Double](0.0, 0.0, 0.0)),
      Option(Seq[java.lang.Double](-0.0, -0.0, -0.0)),
      Option(Seq[java.lang.Double](0.0, 0.0, 1e-300)),
      Option(Seq[java.lang.Double](1.0, Double.NaN, 3.0)),
      Option(Seq[java.lang.Double](1.0, Double.PositiveInfinity, 3.0)),
      Option(Seq[java.lang.Double](1.0, null, 3.0)),
      Option(Seq[java.lang.Double]()),
      Option.empty[Seq[java.lang.Double]]).toDF("v")
    val (g, i) = bothModes(df.select(VectorFunctions.vecIndexable($"v")))
    g shouldBe i
    g shouldBe Seq("[true]", "[false]", "[false]", "[true]", "[false]",
      "[false]", "[false]", "[false]", "[false]")
  }

  test("null inputs are null through both paths") {
    val df = Seq[Option[String]](None, Some("some text that is long enough"))
      .toDF("text")
    val (g, i) = bothModes(df.select(
      TextFunctions.rollingHashes($"text", 16, 257L, 1000000007L).as("rh"),
      TextFunctions.simhash64(split($"text", " ")).as("sh")))
    g shouldBe i
    g.head should (include("null"))
  }
}
