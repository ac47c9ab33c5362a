package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bigram conditional-LM surprisal scoring (extension family E4,
  * continued) — the next step up from `llm_e4_unigram_logprob`'s
  * unigram LM toward the KenLM-style n-gram scorers CCNet-class
  * pipelines use for quality filtering: score each document by its mean
  * negative conditional log-probability -mean(ln p(tok | prev)) under
  * the corpus's own bigram distribution, p(tok|prev) =
  * c2(prev,tok) / c1(prev).
  *
  * 100 TB shape: the bigram table is vocabulary²-BOUNDED (and in
  * practice Zipf-sparse), not corpus-sized, so like the unigram TF
  * table it broadcasts; c1 derives from c2 by a tiny re-aggregation
  * (never a second corpus pass) and is folded into the same broadcast.
  * The corpus-sized bigram stream is a pure per-row posexplode — prev
  * comes from indexing the token array, NOT a lag window, so there is
  * ZERO shuffle before the vocabulary-keyed pair aggregation and the
  * doc_id-keyed mean. Order-insensitive by construction (same
  * discipline as the unigram twin): each ln lands on the exact 1e-7
  * integer grid ([[LlmOps.ln7]]) so the per-doc sum is exact in any
  * order, and the mean is one division of exact operands before q4.
  */
object BigramLm {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")
  private def toks(text: Column): Column = split(text, " ", -1)

  private val surprisal = GraftQuery(
    "llm_e4_bigram_surprisal",
    "corpus bigram conditional-LM surprisal, vocab^2-bounded broadcast model (E4)",
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      tok AS (
        SELECT doc_id, unnest(generate_series(2, len(t))) AS pos, t FROM t),
      pairs AS (
        SELECT doc_id, t[pos - 1] AS prev, t[pos] AS tk FROM tok),
      c2 AS (SELECT prev, tk, COUNT(*) AS n2 FROM pairs GROUP BY prev, tk),
      c1 AS (SELECT prev, SUM(n2) AS n1 FROM c2 GROUP BY prev)
      SELECT p.doc_id,
             COUNT(*) AS n_bigrams,
             ${LlmOps.q4Sql(
               s"sum(${LlmOps.ln7Sql("CAST(c1.n1 AS DOUBLE)")}" +
                 s" - ${LlmOps.ln7Sql("CAST(c2.n2 AS DOUBLE)")})" +
                 " / (count(*) * 10000000.0)")}
               AS avg_neg_logprob
      FROM pairs p
      JOIN c2 ON c2.prev = p.prev AND c2.tk = p.tk
      JOIN c1 ON c1.prev = p.prev
      GROUP BY p.doc_id
      ORDER BY p.doc_id"""),
    (s, dir) => {
      // prev by array index (1-based element_at; posexplode pos is
      // 0-based, so element_at(t, pos) IS the previous token) — a
      // narrow projection, no per-doc window
      val pairs = docs(s, dir)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("pos", "tk")))
        .filter(col("pos") >= 1)
        .select(col("doc_id"), element_at(col("t"), col("pos")).as("prev"), col("tk"))
      // the bigram model costs one corpus aggregation — memoized so the
      // broadcast branch below doesn't rebuild it (released by
      // SessionMemo.clear); c1 derives from c2, never a second pass
      val c2 = graft.SessionMemo.materialized(s, dir, "bigram_c2") {
        pairs.groupBy(col("prev"), col("tk")).agg(count(lit(1)).as("n2"))
      }
      val model = c2.join(
        c2.groupBy(col("prev")).agg(sum(col("n2")).as("n1")), Seq("prev"))
      pairs
        .join(broadcast(model), Seq("prev", "tk"))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_bigrams"),
          sum(LlmOps.ln7(col("n1").cast("double"))
            - LlmOps.ln7(col("n2").cast("double"))).as("sum7"))
        .select(col("doc_id"), col("n_bigrams"),
          LlmOps.q4(col("sum7") / (col("n_bigrams") * lit(1.0e7)))
            .as("avg_neg_logprob"))
        .orderBy(col("doc_id"))
    })

  def queries: Seq[GraftQuery] = Seq(surprisal)
}
