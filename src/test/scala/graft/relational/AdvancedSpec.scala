package graft.relational

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the second relational wave
  * (Advanced/Subqueries): decorrelated join strategies, grouping-set
  * algebra, selector-aggregate determinism, and sampling invariants. */
class AdvancedSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_exists_subquery plans a semi join, not a distinct after inner join") {
    val p = run("q_exists_subquery").queryExecution.executedPlan.toString
    p.toLowerCase should include("leftsemi")
    p should not include "Distinct"
  }

  test("q_not_in_subquery plans an anti join") {
    val p = run("q_not_in_subquery").queryExecution.executedPlan.toString
    p.toLowerCase should include("leftanti")
  }

  test("q_grouping_sets: one Expand, marginals sum to the grand total") {
    val df = run("q_grouping_sets")
    df.queryExecution.executedPlan.toString should include("Expand")
    val rows = df.collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    val total = byGid(3L).head.getAs[Long]("n_items")
    byGid(1L).map(_.getAs[Long]("n_items")).sum shouldBe total // per-flag marginal
    byGid(2L).map(_.getAs[Long]("n_items")).sum shouldBe total // per-status marginal
  }

  test("q_max_by_selectors: selector key is unique, so best==argmax of price") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val expected = orders
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)))
      .filter(col("r") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("best_order"))
    val got = run("q_max_by_selectors").select("o_custkey", "best_order")
    got.except(expected).count() shouldBe 0
    expected.except(got).count() shouldBe 0
  }

  test("q_unpivot_measures: 3 long rows per wide row, values preserved") {
    val rows = run("q_unpivot_measures").collect()
    val flags = rows.map(_.getString(0)).distinct
    rows.length shouldBe flags.length * 3
    rows.map(_.getString(1)).distinct.sorted shouldBe Array("n_items", "sum_price", "sum_qty")
  }

  test("q_exact_percentiles: quartiles are ordered and bracket the median") {
    run("q_exact_percentiles").collect().foreach { r =>
      val q25 = r.getDouble(r.fieldIndex("qty_q25"))
      val q50 = r.getDouble(r.fieldIndex("qty_q50"))
      val q75 = r.getDouble(r.fieldIndex("qty_q75"))
      val m = r.getDouble(r.fieldIndex("qty_median"))
      q25 should be <= q50
      q50 shouldBe m
      q50 should be <= q75
    }
  }

  test("q_window_range_frame: 90-day spend >= own order price, monotone per single-order window") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    val joined = run("q_window_range_frame")
      .join(orders, "o_orderkey")
      .select(col("spend_90d"), col("o_totalprice"))
      .collect()
    joined.foreach { r =>
      // frame includes the current row, so rolling spend covers at least it
      r.getDouble(0) should be >= r.getDouble(1) - 0.01
    }
  }

  test("llm_e4_quota_sample: exact ceil(n/10) per language, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = Registry.byName("llm_e4_quota_sample").run(spark, sfDir)
    val got = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      got(lang) shouldBe math.ceil(n / 10.0).toLong
    }
    // re-running yields the identical id set (hash ranking, no RNG)
    val again = Registry.byName("llm_e4_quota_sample").run(spark, sfDir)
    sample.except(again).count() shouldBe 0
  }

  test("q_merge_upsert: merged totals equal a direct full-table aggregate; ops partition the keys") {
    val merged = run("q_merge_upsert")
    val direct = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    // row-for-row conservation: every customer's merged order count equals
    // the count a from-scratch aggregate produces (the MERGE lost nothing)
    merged.select("o_custkey", "n_orders").except(direct).count() shouldBe 0
    direct.except(merged.select("o_custkey", "n_orders")).count() shouldBe 0
    val ops = merged.groupBy("merge_op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ops.keySet.subsetOf(Set("insert", "update", "unchanged")) shouldBe true
    ops.values.sum shouldBe merged.count()
  }

  test("q_merge_upsert plan: both sides pre-aggregated — full outer join reuses the agg partitioning") {
    val p = run("q_merge_upsert").queryExecution.executedPlan.toString
    p should include("FullOuter")
    // exactly 2 aggregate exchanges feed the join; no third shuffle for it
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    exchanges should be <= 2
  }

  test("q_window_rank_family: rank/dense/percent/cume algebra holds on tie groups") {
    val rows = run("q_window_rank_family").collect()
    rows.groupBy(_.getString(1)).foreach { case (_, part) =>
      val n = part.length.toDouble
      // within a tie group (same month) rank-family values are constant
      part.groupBy(_.getString(2)).foreach { case (_, ties) =>
        ties.map(_.getLong(3)).distinct.length shouldBe 1 // rank
        ties.map(_.getLong(4)).distinct.length shouldBe 1 // dense_rank
        ties.map(_.getDouble(5)).distinct.length shouldBe 1 // percent_rank
      }
      // dense_rank is the tie-group index; rank jumps by group size
      val groups = part.groupBy(_.getString(2)).toSeq.sortBy(_._1)
      groups.map(_._2.head.getLong(4)) shouldBe (1L to groups.length)
      // percent_rank in [0,1]; cume_dist positive, ending at exactly 1
      part.foreach { r =>
        r.getDouble(5) should (be >= 0.0 and be <= 1.0)
        r.getDouble(6) should (be > 0.0 and be <= 1.0)
      }
      // ntile(4) buckets differ in size by at most 1
      val sizes = part.groupBy(_.getLong(7)).values.map(_.size)
      (sizes.max - sizes.min) should be <= 1
      sizes.sum.toDouble shouldBe n
    }
  }

  test("q_snapshot_diff: classification is consistent with the carried old/new values") {
    val rows = run("q_snapshot_diff").collect()
    rows.foreach { r =>
      val (oldN, newN) = (Option(r.get(1)), Option(r.get(2)))
      r.getString(5) match {
        case "added" => oldN shouldBe None; newN should not be None
        case "removed" => newN shouldBe None; oldN should not be None
        case "unchanged" =>
          r.getLong(1) shouldBe r.getLong(2)
          r.getDouble(3) shouldBe r.getDouble(4)
        case "changed" =>
          assert(r.getLong(1) != r.getLong(2) || r.getDouble(3) != r.getDouble(4))
      }
    }
    // keys are unique and cover both snapshots exactly once
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
  }

  test("llm_e4_tfidf_topterms: <=3 terms per doc, rarer term outranks ubiquitous one at equal tf") {
    val df = Registry.byName("llm_e4_tfidf_topterms").run(spark, sfDir)
    val counts = df.groupBy("doc_id").count().agg(max("count")).head().getLong(0)
    counts should be <= 3L
    // score really is tf * N / df
    val docsN = spark.read.parquet(s"$sfDir/documents.parquet").count().toDouble
    df.collect().take(50).foreach { r =>
      val tf = r.getAs[Long]("tf"); val dfv = r.getAs[Long]("df")
      r.getAs[Double]("score") shouldBe tf * (docsN / dfv)
    }
  }
}
