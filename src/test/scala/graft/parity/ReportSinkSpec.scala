package graft.parity

import graft.SparkSpec
import org.apache.spark.sql.functions
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S6 sink: per-source flagged reports with reference presentation rules. */
class ReportSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writes one gated report per source with first-row-only blanking") {
    val out = Files.createTempDirectory("graft_report").toString
    val ann = Annotate.annotated(Seq(
      (1L, "10, slow big text", "en", "fileA"),
      (2L, "11, clean text", "en", "fileA"),   // no tags
      (3L, "12, dup line", "en", "fileB"),
      (4L, "13, nothing here", "en", "fileC")  // no tags -> fileC absent
    ).toDF("doc_id", "text", "lang", "source"))

    val n = ReportSink.writeFlaggedReports(ann, out)
    n shouldBe 3L // doc 1 has 2 tags, doc 3 has 1

    def lines(src: String): Seq[String] =
      Files.list(Paths.get(s"$out/source=$src")).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".txt"))
        .flatMap(p => Files.readAllLines(p).asScala)

    // gating: only sources with >= 1 flagged doc get a report
    Files.exists(Paths.get(s"$out/source=fileC")) shouldBe false

    val a = lines("fileA")
    a.head should startWith("Record #")
    // doc 1: first tag row carries the record keys, second is blanked
    val doc1 = a.filter(_.contains("slow")) // tag rows for doc 1 mention tag literal
    a.exists(l => l.startsWith("10") && l.contains("slow")) shouldBe true
    a.exists(l => l.trim.startsWith("big") && !l.contains("10")) shouldBe true
    // doc 2 (no tags) never appears
    a.exists(_.contains("11")) shouldBe false

    val b = lines("fileB")
    b.head should startWith("Record #")
    b.exists(l => l.startsWith("12") && l.contains("dup")) shouldBe true
    doc1 should not be empty
  }
}
