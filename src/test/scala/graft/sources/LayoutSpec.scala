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
}
