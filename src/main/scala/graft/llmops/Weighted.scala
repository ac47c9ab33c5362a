package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement (extension family
  * E4, continued): the A-ES / Efraimidis–Spirakis scheme — each doc gets
  * priority u^(1/w) for a uniform u and weight w, and the global top-n
  * priorities ARE a weighted sample without replacement. Corpus curation
  * uses this shape to bias training data toward long/high-quality docs
  * while staying reproducible run to run.
  *
  * Determinism: u derives from md5(doc_id) (the same content-independent
  * coin as `llm_e4_hash_split`), never from a RNG, so the sample is a
  * pure function of the table — re-runs and partitionings agree
  * exactly. Priorities compare via ln(u)/w (monotone in u^(1/w)); the
  * priority VALUE is never output because libm `ln` may differ in the
  * last ulp across engines. CROSS-ENGINE caveat: that same last-ulp
  * difference could in principle swap two docs whose priorities collide
  * within ~1 ulp exactly at the top-n boundary, flipping one sample
  * member vs the oracle. With 32-bit-hash-derived uniforms the
  * probability of such a boundary collision is ~2^-40 per run —
  * accepted, because the exact alternative (comparing u1^w2 vs u2^w1
  * as big-integer powers with w up to n_chars) is thousands of bits per
  * comparison and not expressible in portable SQL. Within ONE engine
  * the sample is fully deterministic regardless.
  *
  * Scale notes: one scan computes (u, w); the global top-n is
  * TakeOrderedAndProject (per-partition heaps + an n-row driver merge),
  * never a full sort. The final rank window runs over the n surviving
  * rows only.
  */
object Weighted {

  private val sampleN = 100

  /** Uniform in (0,1): (first-8-md5-hex-of-id + 0.5) / 2^32 — the +0.5
    * keeps u strictly positive so ln(u) is finite. */
  private def uniform(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double") + 0.5) /
      lit(4294967296.0)

  private val weightedSample = GraftQuery(
    "llm_e4_weighted_sample",
    "deterministic A-ES weighted sample: top-100 by u^(1/n_chars) priority (E4)",
    Some(s"""
      WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                  / 4294967296.0) / n_chars AS priority
        FROM documents),
      top AS (
        SELECT doc_id, lang, n_chars, priority
        FROM keyed
        ORDER BY priority DESC, doc_id
        LIMIT $sampleN)
      SELECT ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS sample_rank,
             doc_id, lang, n_chars
      FROM top
      ORDER BY sample_rank"""),
    (s, dir) => {
      val keyed = T(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("priority", log(uniform(col("doc_id"))) / col("n_chars"))
      val top = keyed
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(sampleN)
      top
        .withColumn("sample_rank",
          row_number().over(Window.orderBy(col("priority").desc, col("doc_id"))))
        .select(col("sample_rank").cast("long"), col("doc_id"), col("lang"),
          col("n_chars"))
        .orderBy(col("sample_rank"))
    })

  def queries: Seq[GraftQuery] = Seq(weightedSample)
}
