package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The auto-vectorization rule must (1) fire on exactly the canonical
  * HOF dot-product shape, (2) preserve results bit-for-bit, and (3)
  * leave near-miss shapes alone. */
class VectorizeRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    GraftOptimizations.install(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .cache()
  }

  private val hofDot =
    "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

  test("rule rewrites the HOF fold to the codegen'd vec_dot expression") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(100)
      .select(expr(hofDot).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    optimized should include("vec_dot")
    optimized should not include "aggregate("
  }

  test("rewritten plan returns bit-identical results to the interpreted fold") {
    GraftOptimizations.install(spark)
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" < $"b.vec_id").limit(500)
    val viaRule = pairs.select($"a.vec_id", $"b.vec_id", expr(hofDot).as("dot"))
      .as[(Long, Long, Double)].collect().toMap2
    // reference: the expression applied directly, bypassing the rewrite
    val direct = pairs.select($"a.vec_id", $"b.vec_id",
        graft.functions.VectorFunctions.dot($"a.v", $"b.v").as("dot"))
      .as[(Long, Long, Double)].collect().toMap2
    viaRule shouldBe direct
  }

  test("near-miss shapes are left to the interpreted HOF path") {
    val df = vecs.as("a").crossJoin(vecs.as("b")).limit(10)
      // different seed (1.0) — must NOT rewrite
      .select(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 1.0D, (acc, v) -> acc + v)").as("s"))
    df.queryExecution.optimizedPlan.toString should not include "vec_dot"
    // different merge op (max) — must NOT rewrite
    val df2 = vecs.as("a").crossJoin(vecs.as("b")).limit(10)
      .select(expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0.0D, (acc, v) -> greatest(acc, v))").as("s"))
    df2.queryExecution.optimizedPlan.toString should not include "vec_dot"
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
