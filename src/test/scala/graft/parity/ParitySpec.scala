package graft.parity

import graft.SparkSpec
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** F1 flatten shape + P3/P6 projection subtleties (SURVEY.md §7.4 — the
  * semantics the reference makes easy to get wrong in Spark). */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  private def annotate(texts: Seq[String]) =
    Annotate.annotated(
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src") }
        .toDF("doc_id", "text", "lang", "source"))

  test("F1 flatten: record row ALWAYS emitted, plus one row per tag") {
    // doc 0: two tags; doc 1: zero tags -> record row only (NOT explode_outer:
    // doc 0 must yield 3 rows, not 2)
    val flat = Parity.flatten(annotate(Seq("slow big day", "clean text"))).cache()
    flat.count() shouldBe 4L

    val rec0 = flat.filter($"doc_id" === 0 && $"issue_literal".isNull).collect()
    rec0.length shouldBe 1
    rec0.head.getAs[Long]("tag_count") shouldBe 2L

    val tags0 = flat.filter($"doc_id" === 0 && $"issue_literal".isNotNull)
      .select($"issue_literal").as[String].collect().toSeq
    tags0.sorted shouldBe Seq("big", "slow")

    val doc1 = flat.filter($"doc_id" === 1).collect()
    doc1.length shouldBe 1
    doc1.head.getAs[String]("issue_literal") shouldBe null
    doc1.head.getAs[Long]("tag_count") shouldBe 0L
  }

  test("flatten row-count invariant: |flat| = |docs| + sum(size(tags)) (property)") {
    // ScalaCheck generators driven by fixed seeds (no scalatestplus bridge
    // in the offline cache, so the forAll runner is hand-rolled)
    val vocab = Gen.oneOf("slow", "big", "dup", "hash", "scan", "clean", "data", "x")
    val textGen = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, vocab).map(_.mkString(" ")))
    val corpusGen = Gen.listOfN(12, textGen)
    for (seed <- 1 to 20) {
      val texts = corpusGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val ann = annotate(texts).cache()
      val expected = ann.count() + ann.select(sum(functions.size($"tags"))).as[Long].head()
      withClue(s"seed=$seed texts=$texts: ") {
        Parity.flatten(ann).count() shouldBe expected
      }
      ann.unpersist()
    }
  }

  test("A2 max(tag_count) over flatten recovers size(tags) exactly") {
    // record row and tag rows duplicate tag_count; max() collapses them to
    // the original per-doc value (reference dashboard_widget.py:166-169)
    val ann = annotate(Seq("slow big dup", "hash", "none here")).cache()
    val viaFlatten = Parity.flatten(ann)
      .groupBy($"doc_id").agg(max($"tag_count").as("m"))
      .select($"doc_id", $"m").as[(Long, Long)].collect().toMap
    val direct = ann.select($"doc_id", functions.size($"tags").cast("long")).as[(Long, Long)]
      .collect().toMap
    viaFlatten shouldBe direct
  }

  test("P3 split-on-first-comma: both edge cases") {
    val df = Seq("12, hello, world", "no comma here", " 7 ,x", ",leading")
      .toDF("text")
      .select(
        Parity.recordNum($"text").as("rn"),
        Parity.literalText($"text", "text").as("lt"))
    df.as[(String, String)].collect().toSeq shouldBe Seq(
      ("12", "hello, world"), // split at FIRST comma only
      ("no comma here", ""),  // no comma -> remainder "" (call-debias.py:96)
      ("7", "x"),             // both sides trimmed
      ("", "leading"))
  }

  test("P6: size(NULL) is not 0 in Spark; coalesce gives the reference's 0") {
    // Spark 4 default: size(NULL) = NULL (legacy sizeOfNull=-1 is off);
    // Python's len(result.get("tags", [])) = 0 — coalesce bridges the gap
    val df = Seq((1, Seq("a")), (2, null)).toDF("id", "xs")
    val raw = df.select(functions.size($"xs").as("n")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    raw shouldBe Set(Some(1), None)
    df.select(coalesce(functions.size($"xs"), lit(0)).as("n")).as[Int]
      .collect().toSeq.sorted shouldBe Seq(0, 1)
  }

  test("P2: null and empty tag arrays are both excluded by the flagged filter") {
    val df = Seq(
      (1L, Seq(Tag("slow", "performance", "lexicon"))),
      (2L, Seq.empty[Tag]),
      (3L, null.asInstanceOf[Seq[Tag]])).toDF("doc_id", "tags")
    val flagged = df.filter(coalesce(functions.size($"tags"), lit(0)) > 0)
    flagged.select($"doc_id").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("C4 sniff: case-insensitive substring, whole-word not required (gui.py:79)") {
    // the GUI lowers the LINE and substring-matches — so mixed case hits,
    // embedded occurrences hit ("terror"), and split words do not
    val lines = Seq(
      ("ok doc 1: all good", false),
      ("Error: annotator failed", true),
      ("FATAL: out of memory", true),
      ("eRRoR mixed case", true),
      ("counter-terrorism corpus note", true), // substring, like the reference
      ("err or split across words", false),
      ("fat al split across words", false))
    val got = lines.map(_._1).toDF("line")
      .select($"line", Parity.c4Flagged($"line").as("f"))
      .as[(String, Boolean)].collect().toMap
    lines.foreach { case (l, want) => withClue(l) { got(l) shouldBe want } }
  }

  test("C4 verdict: one flagged line anywhere in a run makes the whole run fatal") {
    // mirrors the GUI's any-line semantics: fatal sticks once set
    val df = Seq(
      (10L, "runA", "ok"), (11L, "runA", "Error: boom"), (12L, "runA", "ok"),
      (20L, "runB", "ok"), (21L, "runB", "ok"))
      .toDF("doc_id", "run", "line")
    val f = Parity.c4Flagged($"line")
    val verdicts = df.groupBy($"run")
      .agg((count(when(f, lit(1))) > 0).as("fatal"),
        min(when(f, $"doc_id")).as("first"))
      .collect().map(r => r.getString(0) -> (r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    verdicts("runA") shouldBe ((true, Some(11L)))
    verdicts("runB") shouldBe ((false, None))
  }
}
