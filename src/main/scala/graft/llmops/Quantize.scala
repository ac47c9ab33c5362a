package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.functions._

/** Embedding quantization audit (extension family E3, continued):
  * symmetric int8 quantization — `scale = max|x| / 127`, `q = round(x /
  * scale)`, reconstruction `q * scale` — and the resulting per-label
  * error envelope. This is the audit a retrieval pipeline runs before
  * committing to a quantized index: how much recall headroom does int8
  * leave per corpus slice.
  *
  * Determinism discipline (same as [[Retrieval]]): every per-element step
  * is a fixed chain of IEEE-754 double ops — float→double widening is
  * exact, `abs`/`floor`/`greatest` are exact, and the one divide and
  * multiply round identically in both engines. Rounding is written as
  * `floor(x / scale + 0.5)` explicitly in BOTH plans, because bare
  * `round()` half-rule conventions differ across engines. All cross-row
  * aggregates are MIN/MAX/COUNT — order-insensitive — so no
  * floating-point summation ever happens.
  *
  * Scale shape: everything before the final aggregate is a map-side
  * per-row array fold (whole-stage codegen'd higher-order functions, no
  * UDF); the only shuffle keys on `label`, whose cardinality tracks the
  * corpus taxonomy. Nothing is collected, nothing is global.
  */
object Quantize {

  private val audit = GraftQuery(
    "llm_e3_quantize_audit",
    "symmetric int8 embedding quantization error envelope per label (E3)",
    Some(s"""
      WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${T.sqlIndexable}),
      m AS (
        SELECT vec_id, label, v,
               list_max(list_transform(v, x -> abs(x))) AS maxabs
        FROM v),
      sc AS (
        SELECT vec_id, label, v,
               maxabs / CAST(127.0 AS DOUBLE) AS scale
        FROM m WHERE maxabs > 0),
      e AS (
        SELECT vec_id, label, scale,
               list_max(list_transform(v, x ->
                 abs(x - floor(x / scale + CAST(0.5 AS DOUBLE)) * scale))) AS linf
        FROM sc)
      SELECT label,
             COUNT(*) AS n_vecs,
             MAX(linf) AS max_err,
             MIN(linf) AS min_err,
             MAX(scale) AS max_scale
      FROM e GROUP BY label ORDER BY label"""),
    (s, dir) => {
      T(s, dir, "embeddings")
        // quantization is a vector op: non-indexable vectors have no
        // scale or reconstruction error — same read contract as
        // LlmOps.embeddings() (T.indexableEmbedding)
        .filter(T.indexableEmbedding)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        // max|x| via an exact fold (greatest/abs — no summation)
        .withColumn("maxabs",
          expr("aggregate(v, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))"))
        .filter(col("maxabs") > 0) // an all-zero vector has no scale
        .withColumn("scale", col("maxabs") / lit(127.0))
        // L∞ reconstruction error; floor(x/s + 0.5) is round-to-nearest
        // written portably (ties away from the floor side in both engines)
        .withColumn("linf",
          expr("aggregate(v, CAST(0.0 AS DOUBLE), " +
            "(a, x) -> greatest(a, abs(x - floor(x / scale + 0.5D) * scale)))"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          max(col("linf")).as("max_err"),
          min(col("linf")).as("min_err"),
          max(col("scale")).as("max_scale"))
        .orderBy(col("label"))
    })

  def queries: Seq[GraftQuery] = Seq(audit)
}
