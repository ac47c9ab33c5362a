package graft

import scala.sys.process._

/** Physical-encoding drift axis (sixteenth, round 17): one table dir
  * mixes files whose writers chose different codecs (zstd, gzip,
  * snappy, uncompressed), pathological row-group sizes (7 rows), data
  * page v2, and dictionary-off encoding — the writer accidents a
  * 100 TB lake accumulates across compactions and tool upgrades. Codec
  * and page layout are PHYSICAL properties; the logical surface must
  * not move at all. The cross-engine half is the full Verify +
  * check.py gate over `tools/make_fixtures.py encdrift` (§2b-p in the
  * verify skill).
  */
class EncodingDriftSpec extends SparkSpec {

  private lazy val encDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_enc_spec").toString
    Seq("python3", "tools/make_fixtures.py", sfDir, dir, "encdrift").!!
    s"$dir/graft_encdrift_sf"
  }

  test("every table reads byte-identically from the mixed-encoding dir") {
    T.tableNames.foreach { t =>
      val clean = T(spark, sfDir, t).collect().map(_.toString).sorted.toSeq
      val mixed = T(spark, encDir, t).collect().map(_.toString).sorted.toSeq
      withClue(t)(mixed shouldBe clean)
    }
  }

  test("representative queries are encoding-invariant end to end") {
    // spans the hot readers: documents text ops, events windows,
    // embeddings vector math, lineitem exact-decimal aggregation
    Seq("llm_e4_doc_quality", "e5_sessionization", "llm_e2_semdedup",
      "q1_pricing_summary").foreach { name =>
      val q = Registry.byName(name)
      val clean = q.run(spark, sfDir).collect().map(_.toString).toSeq
      val mixed = q.run(spark, encDir).collect().map(_.toString).toSeq
      withClue(name)(mixed shouldBe clean)
    }
  }
}
