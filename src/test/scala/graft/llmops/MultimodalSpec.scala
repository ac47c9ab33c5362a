package graft.llmops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Pair-curation semantics on planted fixtures (the registered
  * mm_pair_curation query covers oracle equivalence at scale). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val goodCaption = Array.fill(25)("word").mkString(" ") +
    " tail filler words to pass the character floor gate easily here"

  test("curatePairs: gates drop violations, caption dedup keeps the smallest id") {
    // 1, 2: duplicate captions (2 must lose the dedup); 3: too few
    // tokens; 4: tiny image; 5: extreme aspect; 6: distinct survivor
    val captions = Seq(
      (1L, goodCaption, goodCaption.length.toLong),
      (2L, goodCaption, goodCaption.length.toLong),
      (3L, "short caption", 110L), // n_chars forged high, tokens low
      (4L, goodCaption + " x", (goodCaption.length + 2).toLong),
      (5L, goodCaption + " y", (goodCaption.length + 2).toLong),
      (6L, goodCaption + " z", (goodCaption.length + 2).toLong)
    ).toDF("doc_id", "text", "n_chars")
    val dims = Seq(
      (1L, 512L, 512L), (2L, 512L, 512L), (3L, 512L, 512L),
      (4L, 32L, 512L),  // min-dim gate
      (5L, 1200L, 300L), // aspect gate (4:1)
      (6L, 640L, 480L)
    ).toDF("media_id", "w", "h")
    val emb = (1L to 6L).map(i => (i, Array.fill(8)(i * 0.01)))
      .toDF("vec_id", "v")
      .select(col("vec_id"), expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))

    val out = Multimodal.curatePairs(captions, dims, emb).collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(1L, 6L)
    // quantized preview: floor(0.01*127 + 0.5) = 1 for media 1
    out.find(_.getLong(0) == 1L).get.getAs[Int]("e1") shouldBe 1
  }

  test("mm_pair_curation: non-empty, unique captions and media ids") {
    val rows = Registry.byName("mm_pair_curation").run(spark, sfDir).collect()
    rows.length should be > 0
    rows.map(_.getAs[String]("caption_md5")).distinct.length shouldBe rows.length
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
  }
}
