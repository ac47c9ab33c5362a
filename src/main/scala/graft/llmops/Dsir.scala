package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by
  * the log importance weight ln(p_target(x) / p_raw(x)) under two
  * hashed-bigram bag-of-features models — the published, cheap way to
  * pick pretraining data that "looks like" a target corpus without
  * training a classifier. Here the target distribution is the corpus's
  * own `lang = 'en'` slice (a stand-in for the curated target set a
  * production run passes) and the raw distribution is the whole pool.
  *
  * Feature hashing uses the repo's engine-neutral md5 bucket idiom
  * (8 hex chars -> BIGINT -> mod [[Dsir.dsirB]]), so the oracle computes
  * the identical buckets. Laplace +1 smoothing over the B buckets keeps
  * every ratio finite; each ln lands on [[LlmOps.ln7]]'s exact 1e-7
  * integer grid so the per-doc sum is order- and partition-insensitive,
  * and the one division happens after all exact arithmetic (then q4).
  *
  * 100 TB shape: BOTH models come out of ONE aggregation over the
  * bigram stream, keyed on the bucket — 128 distinct keys, so map-side
  * partial aggregation collapses every task's contribution to <= B rows
  * and the exchange is constant-size regardless of corpus scale. The
  * model (B rows) and its totals (1 row) broadcast back onto the same
  * stream; the only corpus-keyed shuffle is the per-doc aggregation.
  * The bigram stream itself is a pure posexplode projection (prev by
  * array index, never a lag window), so there is ZERO shuffle before
  * the two aggregations.
  */
object Dsir {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")
  private def toks(text: Column): Column = split(text, " ", -1)

  /** Hashed-feature bucket count. Real DSIR uses 10k; 128 keeps every
    * bucket populated at test scale while exercising the identical
    * plan (the bucket count never appears on a corpus-sized edge). */
  private[llmops] val dsirB = 128

  /** The target-distribution slice. Production passes its curated
    * target corpus; the contract query pins the corpus's own English
    * slice so the oracle is closed-form. */
  private[llmops] val dsirTargetLang = "en"

  private val weights = GraftQuery(
    "llm_e4_dsir_weights",
    s"DSIR hashed-bigram log importance weights, target = lang '$dsirTargetLang' (E4)",
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
      occ AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(t[pos - 1] || ' ' || t[pos]), 1, 8)) AS BIGINT)
                 % $dsirB AS b
        FROM (SELECT doc_id, lang, t, unnest(generate_series(2, len(t))) AS pos FROM t)),
      model AS (
        SELECT b, COUNT(*) AS cr,
               COUNT(*) FILTER (WHERE lang = '$dsirTargetLang') AS ct
        FROM occ GROUP BY b),
      tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM model)
      SELECT o.doc_id,
             COUNT(*) AS n_bigrams,
             ${LlmOps.q4Sql(
               s"(SUM(${LlmOps.ln7Sql("CAST(m.ct + 1 AS DOUBLE)")}" +
                 s" - ${LlmOps.ln7Sql("CAST(m.cr + 1 AS DOUBLE)")})" +
                 s" + COUNT(*) * (${LlmOps.ln7Sql(s"CAST(tot.nr + $dsirB AS DOUBLE)")}" +
                 s" - ${LlmOps.ln7Sql(s"CAST(tot.nt + $dsirB AS DOUBLE)")}))" +
                 " / 10000000.0")}
               AS dsir_logweight
      FROM occ o JOIN model m USING (b) CROSS JOIN tot
      GROUP BY o.doc_id, tot.nr, tot.nt
      ORDER BY o.doc_id"""),
    (s, dir) => {
      // prev by array index: posexplode pos is 0-based, element_at is
      // 1-based, so element_at(t, pos) IS the previous token
      val occ = docs(s, dir)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("lang"),
          posexplode(col("t")).as(Seq("pos", "tk")), col("t"))
        .filter(col("pos") >= 1)
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(
            concat(element_at(col("t"), col("pos")), lit(" "), col("tk"))), 1, 8), 16, 10)
            .cast("long") % dsirB).as("b"))
      // ONE pass over the bigram stream: the occurrence stream is first
      // collapsed to (doc_id, lang, bucket, k) — the model pass and the
      // scoring pass both derive from that collapsed frame, where the
      // previous spelling re-ran the scan + explode + md5 projection
      // once per consumer (two full corpus passes; r19 isolate at
      // sf0.1: median 2.10 → 1.82 s, identical output). Exactness: every
      // summand is an integral-valued double on the ln7 grid, so
      // Σ_occurrences v ≡ Σ_groups k·v exactly (integer sums below 2^53
      // are associative in IEEE doubles).
      val g = occ.groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("k"))
      // one aggregation yields BOTH models: raw = every occurrence,
      // target = the lang-slice, counted side by side per bucket
      val model = g.groupBy(col("b")).agg(
        sum(col("k")).as("cr"),
        sum(when(col("lang") === dsirTargetLang, col("k")).otherwise(0L)).as("ct"))
      val tot = model.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
      g.join(broadcast(model), Seq("b"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("k")).as("n_bigrams"),
          sum(col("k") * (LlmOps.ln7((col("ct") + 1).cast("double"))
            - LlmOps.ln7((col("cr") + 1).cast("double")))).as("sum7"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_bigrams"),
          LlmOps.q4((col("sum7")
            + col("n_bigrams") * (LlmOps.ln7((col("nr") + dsirB).cast("double"))
              - LlmOps.ln7((col("nt") + dsirB).cast("double"))))
            / lit(1.0e7)).as("dsir_logweight"))
        .orderBy(col("doc_id"))
    })

  def queries: Seq[GraftQuery] = Seq(weights)
}
