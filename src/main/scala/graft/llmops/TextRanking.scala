package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative text ranking + sampling (extension family E4):
  * TF-IDF keyword extraction and deterministic per-stratum quota
  * sampling — the ops a training-data pipeline runs between cleaning
  * and packing (keyword-based filtering, balanced per-language subsets).
  */
object TextRanking {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")

  /** TF-IDF top-3 terms per document. The idf here is the rational
    * variant N/df (not log(N/df)): libm log can differ in the last ulp
    * between engines, while integer-derived division is IEEE-identical —
    * the RANKING is the same for any monotone idf. tf·(N/df): exact
    * integer inputs, one double division + one multiply, bit-identical
    * on both engines. Two shuffles total (doc-term counts, df counts);
    * N is a broadcast scalar, the per-doc top-k a bounded window. */
  private val tfidf = GraftQuery(
    "llm_e4_tfidf_topterms",
    "TF-IDF (rational idf) top-3 terms per doc (E4)",
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
      df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
      n AS (SELECT COUNT(*) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * (CAST(n.n AS DOUBLE) / df.df) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, term) AS rk
        FROM scored)
      SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score
      FROM ranked WHERE rk <= 3
      ORDER BY doc_id, score DESC, term"""),
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val df = tok.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n"))
      val scored = tf.join(df, "term")
        .crossJoin(broadcast(n)) // one-row scalar — always broadcastable
        .withColumn("score", col("tf") * (col("n").cast("double") / col("df")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    })

  /** Deterministic per-language quota sample: rank docs inside each
    * language by content hash (md5 — reproducible across engines and
    * runs, unlike random()) and keep the first ⌈n/10⌉. The balanced-
    * subset op for training mixes; the hash ranking means adding new
    * docs only perturbs the sample locally. One window over the lang
    * partition — no global sort, no collect. */
  private val quotaSample = GraftQuery(
    "llm_e4_quota_sample",
    "deterministic 10% per-language quota sample by content hash (E4)",
    Some("""
      WITH r AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang ORDER BY md5(COALESCE(text, '')), doc_id) AS rk,
          COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents)
      SELECT doc_id, lang FROM r
      WHERE rk <= CEIL(n / 10.0)
      ORDER BY lang, doc_id"""),
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      val cw = Window.partitionBy(col("lang"))
      docs(s, dir)
        // hash the COALESCEd text: a null doc still occupies a sample
        // slot, and an un-coalesced md5(NULL) rank key would hit the
        // engines' opposite null-ordering defaults (Spark NULLS FIRST,
        // DuckDB NULLS LAST — measured, round-11 null-injection gate)
        .withColumn("h", md5(coalesce(col("text"), lit(""))))
        .withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(cw))
        .filter(col("rk") <= ceil(col("n") / 10.0))
        .select(col("doc_id"), col("lang"))
        .orderBy("lang", "doc_id")
    })

  /** Corpus-wide top-20 trigrams through the custom `word_ngrams`
    * Generator (the UDTF surface, §2.12 — [[graft.functions.WordNgrams]]):
    * Generate streams each document's windows without materializing the
    * per-doc n-gram array, then one partial/final count aggregate and a
    * TakeOrdered top-k (per-partition heaps + a 20-row driver merge —
    * never a global sort). Ties at the cut break on the ngram text, so
    * the result is total-order deterministic. */
  private val trigramTopK = GraftQuery(
    "llm_e4_trigram_topk",
    "top-20 corpus trigrams via the custom word_ngrams Generator (E4 §2.12 UDTF)",
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT array_to_string(t[i:i+2], ' ') AS ngram
        FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM t WHERE len(t) >= 3))
      SELECT ngram, count(*) AS n_occurrences
      FROM w GROUP BY ngram
      ORDER BY n_occurrences DESC, ngram
      LIMIT 20"""),
    (s, dir) => {
      import graft.functions.WordNgrams.wordNgrams
      docs(s, dir)
        .select(wordNgrams(split(col("text"), " ", -1), 3).as(Seq("pos", "ngram")))
        .groupBy(col("ngram"))
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("ngram"))
        .limit(20)
    })

  /** Heavy hitters: terms above a 1/30 frequency share, via the
    * two-pass sketch-then-verify pattern — pass 1 runs Spark's
    * `stat.freqItems` (Karp et al. single-pass, bounded memory, returns
    * a SUPERSET of the true heavy hitters whose contents can vary with
    * partitioning), pass 2 exact-counts ONLY the broadcast candidate
    * list and keeps terms meeting the threshold. The superset ∩
    * exact-threshold intersection is the exact heavy-hitter set, so the
    * output is deterministic and oracle-checkable even though the
    * intermediate sketch is not.
    *
    * Why this shape at 100 TB: a plain groupBy(term) aggregates EVERY
    * distinct term (billions for web text); the sketch bounds pass-2's
    * aggregate to ≤ 1/support candidates, so the exact verification
    * aggregate is constant-sized no matter how large the vocabulary.
    * Thresholding is integer arithmetic (cnt·30 ≥ total, shares in
    * basis points via integer div) — no float boundary anywhere. */
  private val heavyHitters = GraftQuery(
    "llm_e4_heavy_hitters",
    "exact heavy hitters (share >= 1/30) via freqItems sketch + exact verify (E4)",
    Some("""
      WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      tot AS (SELECT COUNT(*) AS n FROM tok),
      c AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term)
      SELECT term, cnt AS n_occurrences,
             cnt * 10000 // n AS share_bp
      FROM c, tot
      WHERE cnt * 30 >= n
      ORDER BY term"""),
    (s, dir) => {
      val tok = docs(s, dir)
        .select(explode(split(col("text"), " ", -1)).as("term"))
      // pass 1: sketch candidates (support just under 1/30 so the
      // superset guarantee covers the exact threshold)
      val cands = tok.stat.freqItems(Seq("term"), 0.03)
        .select(explode(col("term_freqItems")).as("term"))
      val total = tok.agg(count(lit(1)).as("n"))
      // pass 2: exact counts of the bounded candidate list only
      tok.join(broadcast(cands), "term")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("n_occurrences"))
        .crossJoin(broadcast(total))
        .filter(col("n_occurrences") * 30 >= col("n"))
        .select(col("term"), col("n_occurrences"),
          expr("n_occurrences * 10000 div n").as("share_bp"))
        .orderBy(col("term"))
    })

  def queries: Seq[GraftQuery] = Seq(tfidf, quotaSample, trigramTopK, heavyHitters)
}
