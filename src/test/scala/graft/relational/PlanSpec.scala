package graft.relational

import graft.{Registry, SparkSpec}

/** Plan-shape regressions: the properties the 100 TB posture depends on,
  * asserted against actual executed plans so a refactor can't silently
  * lose them. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).run(spark, sfDir).queryExecution.executedPlan.toString

  test("q3: date filters reach the parquet scan, columns pruned") {
    val p = plan("q3_top_unshipped_orders")
    p should include("PushedFilters")
    p should include("GreaterThan(l_shipdate")
    p should include("LessThan(o_orderdate")
    // projection pruning: lineitem scan must not read unneeded wide columns
    p should not include "l_comment"
    p should not include "l_shipinstruct"
  }

  test("q5: fixed-cardinality dims broadcast, no forced broadcast on customer") {
    val p = plan("q5_region_revenue")
    p should include("BroadcastExchange") // nation/region hints survive
    val logical = Registry.byName("q5_region_revenue").run(spark, sfDir)
      .queryExecution.logical.toString
    // the hint is only on nation/region reads, never an SF-scaled table:
    // ResolvedHint nodes in the logical plan = exactly 2 (nation, region)
    logical.split("UnresolvedHint|ResolvedHint").length - 1 shouldBe 2
  }

  test("parity_a1: whole-stage codegen covers the flatten + aggregate") {
    // AQE keeps codegen collapse per-stage; CodegenMode forces generation
    val p = Registry.byName("parity_a1_issue_distribution").run(spark, sfDir)
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    p should include("WholeStageCodegen")
    p should not include "collect_list" // flatten never gathers per-group arrays
  }

  test("llm_e1_exact_dedup: partial aggregation before the shuffle") {
    val p = plan("llm_e1_exact_dedup")
    p should include("partial_min") // map-side combine on the hash key
  }

  test("no registry query plans a CartesianProduct") {
    // the per-round crossJoin audit, automated: every crossJoin in the
    // repo is either a broadcast 1-row scalar or a dimension-bounded
    // grid, so every one must plan as a BroadcastNestedLoopJoin. A
    // CartesianProductExec means a broadcast hint was lost (or a new
    // query shipped an unbounded pairs join) — the shuffle-both-sides
    // plan that cannot survive 100 TB.
    graft.Registry.all.foreach { q =>
      val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
      withClue(s"${q.name}: ") { p should not include "CartesianProduct" }
    }
  }
}
