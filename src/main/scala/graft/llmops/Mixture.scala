package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temperature-scaled corpus mixing (extension family E4, continued) —
  * the published multilingual/multi-source sampling rule (Conneau &
  * Lample 2019 XLM; the GPT-3 dataset-mixture construction): sample
  * source i with probability p_i ∝ n_i^α, α < 1, so small sources are
  * upsampled relative to their natural share and head sources stop
  * dominating the mixture. The complement of `llm_e4_domain_mix`'s
  * FIXED weight table: here the weights are DERIVED from corpus token
  * counts, the knob is the temperature α = [[Mixture.alpha]].
  *
  * Exactness discipline: n_i^α with α = 1/2 is one `sqrt` of an
  * integer-valued double — correctly rounded IEEE in both engines —
  * but the cross-source SUM of those roots would be order-sensitive,
  * so each root is truncated onto the exact 1e-7 integer grid first
  * (the [[LlmOps.ln7]] trick): integer-valued doubles below 2^53 sum
  * exactly in any order, p_i becomes one division of exact operands,
  * and q4 lands both engines on the same value by construction. The
  * boost column (p_i over the natural share) divides the same exact
  * grids.
  *
  * 100 TB shape: one corpus aggregation with map-side partials keyed
  * on `source` (bounded: sources are a curated enum), then a 1-row
  * total broadcast back onto the per-source rows — the
  * constant-exchange pattern DSIR uses. Nothing corpus-sized moves
  * after the first aggregation.
  */
object Mixture {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")

  /** Mixing temperature: p_i ∝ n_i^alpha. 1/2 keeps the root exactly
    * one correctly-rounded IEEE op (sqrt); other temperatures swap in
    * pow at the same plan shape. */
  private[llmops] val alpha = 0.5

  /** sqrt truncated onto the exact 1e-7 integer grid — order-exact
    * summands, the ln7 discipline applied to roots. */
  private def rt7(c: Column): Column = {
    val y = sqrt(c) * lit(1.0e7)
    y - (y % lit(1.0))
  }
  private def rt7Sql(e: String): String =
    s"(sqrt($e) * 10000000.0 - ((sqrt($e) * 10000000.0) % 1.0))"

  private val mix = GraftQuery(
    "llm_e4_temperature_mix",
    s"temperature-scaled source sampling weights, p ~ tokens^$alpha (E4)",
    Some(s"""
      WITH t AS (
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(len(string_split(text, ' '))) AS n_tokens
        FROM documents GROUP BY source),
      g AS (
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               ${rt7Sql("CAST(n_tokens AS DOUBLE)")} AS r7
        FROM t),
      tot AS (
        SELECT SUM(r7) AS rsum, CAST(SUM(n_tokens) AS DOUBLE) AS tsum FROM g)
      SELECT g.source, g.n_docs, g.n_tokens,
             ${T.quantizeSql("g.r7 / tot.rsum", "10000.0")} AS p_sample,
             ${T.quantizeSql(
               "(g.r7 / tot.rsum) / (CAST(g.n_tokens AS DOUBLE) / tot.tsum)",
               "10000.0")} AS boost
      FROM g, tot
      ORDER BY g.source"""),
    (s, dir) => {
      val g = docs(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ", -1))).cast("long").as("n_tokens"))
        .withColumn("r7", rt7(col("n_tokens").cast("double")))
      val tot = g.agg(
        sum(col("r7")).as("rsum"),
        sum(col("n_tokens")).cast("double").as("tsum"))
      g.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          T.quantize(col("r7") / col("rsum"), 10000.0).as("p_sample"),
          T.quantize((col("r7") / col("rsum"))
            / (col("n_tokens").cast("double") / col("tsum")), 10000.0).as("boost"))
        .orderBy(col("source"))
    })

  def queries: Seq[GraftQuery] = Seq(mix)
}
