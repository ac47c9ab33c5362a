package graft.llmops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** A-ES weighted sampling: deterministic, size-exact, and biased toward
  * heavy (long) documents as the scheme promises. Runs at sf0.01 — the
  * sf0.001 corpus is smaller than the sample size, which only exercises
  * the degenerate everything-selected path. */
class WeightedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("llm_e4_weighted_sample is deterministic and size-exact") {
    val q = Registry.byName("llm_e4_weighted_sample")
    val a = q.run(spark, dir).collect()
    val b = q.run(spark, dir).collect()
    a.length shouldBe 100
    a should contain theSameElementsInOrderAs b
    a.map(_.getLong(0)).toSeq shouldBe (1L to 100L) // dense ranks
  }

  test("sample is weight-biased: mean n_chars well above the corpus mean") {
    val corpusMean = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = Registry.byName("llm_e4_weighted_sample").run(spark, dir)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    // weights are n_chars; an unweighted sample would match the corpus
    // mean in expectation — the A-ES sample must sit clearly above it
    sampleMean should be > corpusMean * 1.05
  }

  test("degenerate case: sample of a corpus smaller than n keeps every doc") {
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val got = Registry.byName("llm_e4_weighted_sample").run(spark, sfDir).count()
    got shouldBe math.min(n, 100L)
  }
}
