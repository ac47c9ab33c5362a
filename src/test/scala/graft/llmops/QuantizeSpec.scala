package graft.llmops

import graft.{Registry, SparkSpec, T}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  test("int8 L-inf reconstruction error is bounded by scale/2") {
    val rows = Registry.byName("llm_e3_quantize_audit").run(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val maxErr = r.getAs[Double]("max_err")
      val maxScale = r.getAs[Double]("max_scale")
      // round-to-nearest guarantees |x - q·scale| <= scale/2 per vector;
      // the per-label max pairs the worst error with the worst scale
      assert(maxErr <= maxScale * 0.5 * (1 + 1e-12),
        s"label ${r.get(0)}: max_err $maxErr exceeds scale/2 ${maxScale * 0.5}")
      r.getAs[Double]("min_err") should be >= 0.0
    }
  }

  test("every non-zero vector is audited exactly once") {
    val audited = Registry.byName("llm_e3_quantize_audit").run(spark, sfDir)
      .agg(sum(col("n_vecs"))).head().getLong(0)
    val nonZero = T(spark, sfDir, "embeddings")
      .filter(expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) > 0"))
      .count()
    audited shouldBe nonZero
  }
}
