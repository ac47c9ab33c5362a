package graft.sources

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Plan-shape + semantics for the storage-layout wave: static partition
  * pruning and dynamic (join-driven) partition pruning. */
class LayoutSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_partition_pruned_scan: PartitionFilters carry the lang predicate; only text is read") {
    val plan = run("q_partition_pruned_scan").queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include regex """PartitionFilters: \[[^\]]*lang[^\]]*= de"""
    // the filter is partition-resolved, NOT a data filter on file contents
    plan should include("PushedFilters: []")
    plan should include("ReadSchema: struct<text:string>")
  }

  test("q_partition_pruned_scan: result matches an unpartitioned filter of the original") {
    val got = run("q_partition_pruned_scan").collect()
    got.length shouldBe 1
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").filter(col("lang") === "de")
    got.head.getAs[Long]("n_docs") shouldBe docs.count()
    got.head.getAs[Long]("n_tokens") shouldBe
      docs.select(expr("sum(size(split(text, ' ', -1)))")).head().getLong(0)
  }

  test("q_dynamic_partition_pruning: a dynamicpruning subquery reaches the fact scan") {
    val plan = run("q_dynamic_partition_pruning").queryExecution.executedPlan.toString
    plan should include("dynamicpruning")
    plan should include("SubqueryAdaptiveBroadcast")
  }

  test("q_dynamic_partition_pruning: exactly the romance languages survive") {
    val rows = run("q_dynamic_partition_pruning").collect()
    rows.map(_.getString(0)).toSeq shouldBe Seq("es", "fr")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    rows.foreach { r =>
      r.getAs[Long]("n_docs") shouldBe docs.filter(col("lang") === r.getString(0)).count()
    }
  }

  test("zValue interleaves bits exactly (x at even positions, y at odd)") {
    import spark.implicits._
    val got = Seq(
      (1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(1,0)=1, z(0,1)=2, z(3,3)=15; all-ones x fills even bits
    // (0x55555555), all-ones y the odd bits (0xAAAAAAAA)
    got shouldBe Seq(1L, 2L, 15L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL)
  }

  test("q_zorder_locality: every z-bucket is a bounded square in (user, time) space") {
    val rows = run("q_zorder_locality").collect()
    rows should not be empty
    // top-6-bit buckets fix the top 3 bits of each 16-bit coordinate:
    // both spans must stay under 2^13 of the 2^16 grid — the two-sided
    // locality a row-major layout cannot provide
    rows.foreach { r =>
      r.getAs[Long]("x_span") should be < 8192L
      r.getAs[Long]("y_span") should be < 8192L
    }
    rows.map(_.getAs[Long]("n_events")).sum shouldBe
      spark.read.parquet(s"$sfDir/events.parquet").count()
  }
}
