package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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

  /** Per-doc surprisal frame (doc_id, n_bigrams, avg_neg_logprob),
    * unordered — shared by the surprisal contract query and the CCNet
    * bucket assignment so both consume ONE definition of the score
    * (and the memoized `bigram_c2` model build underneath it). */
  private[llmops] def scored(s: SparkSession, dir: String): DataFrame = {
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
  }

  /** The oracle-side twin of [[scored]]: CTE chain ending in
    * `scores(doc_id, n_bigrams, avg_neg_logprob)` — spliced after WITH
    * by both oracle SQLs so the two queries can never disagree on what
    * the score IS. */
  private[llmops] val scoresCtes: String = s"""t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      tok AS (
        SELECT doc_id, unnest(generate_series(2, len(t))) AS pos, t FROM t),
      pairs AS (
        SELECT doc_id, t[pos - 1] AS prev, t[pos] AS tk FROM tok),
      c2 AS (SELECT prev, tk, COUNT(*) AS n2 FROM pairs GROUP BY prev, tk),
      c1 AS (SELECT prev, SUM(n2) AS n1 FROM c2 GROUP BY prev),
      scores AS (
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
        GROUP BY p.doc_id)"""

  private val surprisal = GraftQuery(
    "llm_e4_bigram_surprisal",
    "corpus bigram conditional-LM surprisal, vocab^2-bounded broadcast model (E4)",
    Some(s"""
      WITH $scoresCtes
      SELECT doc_id, n_bigrams, avg_neg_logprob
      FROM scores
      ORDER BY doc_id"""),
    (s, dir) => scored(s, dir).orderBy(col("doc_id")))

  /** CCNet calibration-sample modulus: a document enters the cutoff
    * sample when its md5 bucket ≡ 0 (mod this). The contract pins 3
    * (≈1/3 of the 500-doc test corpus → every lang's terciles are
    * well-populated); a production run sets the modulus so the SAMPLE
    * is fixed-size (CCNet's calibration set is ~tens of thousands of
    * docs per language regardless of corpus size), which is what keeps
    * the per-lang rank window below corpus-proportional. */
  private[llmops] val ccnetSampleMod = 3

  /** Calibration-sample size contract (the [[LlmOps]] eval-broadcast
    * pattern): the cutoff ranking windows run OVER THE SAMPLE, and the
    * cutoff table broadcasts — both sound only while the sample is
    * bounded. The md5-mod construction makes it corpus/mod, so a
    * deployment that scales the corpus without scaling the modulus
    * would silently grow per-lang sort partitions; rather than degrade
    * opaquely, the query fails fast past `graft.ccnetSample.maxRows`
    * (default 1,000,000 — far above any real calibration set; CCNet
    * used ~tens of thousands per lang) with the knob named. The check
    * rides the cuts job the query pays for anyway: the cuts aggregate
    * carries each lang's sample count, and the collected cuts rows
    * (#langs — the same boundedness that justifies broadcasting them)
    * are summed driver-side, so no extra corpus pass runs just to
    * validate (round-17 advice; the earlier eager `samp.count()`
    * executed the whole scoring pipeline once more per (session, dir)).
    * Deliberate consequence: the guard is POST-HOC — an oversized sample
    * finishes the per-lang sort once before the require throws. That is
    * the chosen trade (validation rides the job the query pays anyway);
    * a deployment that wants fail-fast instead can afford a
    * `samp.limit(maxRows + 1).count()` probe before the window job —
    * bounded by construction — at the cost of one extra job per
    * construction on the always-healthy path. */
  private val ccnetSampleMaxConf = "graft.ccnetSample.maxRows"
  private def requireBoundedSample(s: SparkSession, rows: Long): Unit = {
    val maxRows =
      s.conf.getOption(ccnetSampleMaxConf).map(_.toLong).getOrElse(1000000L)
    require(rows <= maxRows,
      s"CCNet calibration sample holds $rows docs, beyond $ccnetSampleMaxConf=$maxRows: " +
        "llm_e4_ccnet_buckets ranks cutoffs over the SAMPLE and broadcasts " +
        "them by contract (fixed-size calibration sets). Lower the sample " +
        s"rate (ccnetSampleMod=$ccnetSampleMod here; production derives it " +
        "from corpus size), or raise the conf if the sort genuinely fits.")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): per language, split the corpus into head / middle / tail
    * terciles of LM score (lower surprisal = cleaner text = head) —
    * the published coarse quality partition most open pretraining
    * corpora (CCNet, RedPajama, FineWeb ancestry) ship with. The LM is
    * the corpus's own bigram model ([[scored]]); production swaps in a
    * KenLM trained on a clean target corpus, same plan.
    *
    * Cutoffs come from a deterministic md5-bucket calibration SAMPLE
    * ([[ccnetSampleMod]]), not a full per-lang sort: rank-based tercile
    * boundaries (the sample's score at rank ⌈n/3⌉ and ⌈2n/3⌉ — element
    * picks, never interpolation, so the cutoff is a value BOTH engines
    * computed on the q4 grid rather than an engine-local weighted
    * average). The full corpus is then labeled by broadcast-joining the
    * per-lang cutoffs (one row per language) and comparing — so the
    * only corpus-sized stages are the score itself and a projection.
    * Docs with no score (under 2 tokens, null text) or a lang absent
    * from the sample label 'unscored' — total function, nothing
    * silently dropped.
    *
    * 100 TB shape: scoring is [[scored]]'s shape (vocab²-bounded model
    * broadcast); the rank window runs over the BOUNDED calibration
    * sample only; cutoffs are #langs rows and broadcast; labeling is a
    * per-row projection. No per-lang corpus-wide sort anywhere.
    */
  private val ccnet = GraftQuery(
    "llm_e4_ccnet_buckets",
    "CCNet head/middle/tail per-lang LM-score terciles, sampled cutoffs (E4)",
    Some(s"""
      WITH $scoresCtes,
      a AS (
        SELECT d.doc_id, d.lang, s.avg_neg_logprob
        FROM documents d LEFT JOIN scores s ON d.doc_id = s.doc_id),
      samp AS (
        SELECT * FROM a
        WHERE avg_neg_logprob IS NOT NULL
          AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % $ccnetSampleMod = 0),
      r AS (
        SELECT lang, avg_neg_logprob,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY avg_neg_logprob, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM samp),
      cuts AS (
        SELECT lang,
               MAX(CASE WHEN rn = (n + 2) // 3 THEN avg_neg_logprob END) AS cut1,
               MAX(CASE WHEN rn = (2 * n + 2) // 3 THEN avg_neg_logprob END) AS cut2
        FROM r GROUP BY lang)
      SELECT a.doc_id, a.lang, a.avg_neg_logprob,
             CASE WHEN a.avg_neg_logprob IS NULL OR c.cut1 IS NULL THEN 'unscored'
                  WHEN a.avg_neg_logprob <= c.cut1 THEN 'head'
                  WHEN a.avg_neg_logprob <= c.cut2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM a LEFT JOIN cuts c ON a.lang = c.lang
      ORDER BY a.doc_id"""),
    (s, dir) => {
      val a = docs(s, dir).select(col("doc_id"), col("lang"))
        .join(scored(s, dir).select(col("doc_id"), col("avg_neg_logprob")),
          Seq("doc_id"), "left")
      val samp = a.filter(col("avg_neg_logprob").isNotNull &&
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % ccnetSampleMod === 0)
      // both windows run over the calibration sample ONLY — bounded by
      // the sampling contract (enforced below), never corpus-proportional
      val order = Window.partitionBy(col("lang"))
        .orderBy(col("avg_neg_logprob"), col("doc_id"))
      val whole = Window.partitionBy(col("lang"))
      val cutsAgg = samp
        .withColumn("rn", row_number().over(order).cast("long"))
        .withColumn("n", count(lit(1)).over(whole))
        .groupBy(col("lang"))
        .agg(
          // `div`, not `/`: Spark's / is double division even on longs
          max(when(col("rn") === expr("(n + 2) div 3"), col("avg_neg_logprob")))
            .as("cut1"),
          max(when(col("rn") === expr("(2 * n + 2) div 3"), col("avg_neg_logprob")))
            .as("cut2"),
          // per-lang sample size, carried so the boundary contract can
          // be validated from THIS job instead of a separate count pass
          max(col("n")).as("n_samp"))
      // cuts collect driver-side: #langs rows, the exact boundedness that
      // already justified broadcasting them (ProductQuant's bounded-collect
      // family); memoized per (session, dir) so reconstruction is free
      val cutRows = graft.SessionMemo.value(s, dir, "ccnet_cuts") {
        cutsAgg.collect().toSeq
      }
      val sampleRows = graft.SessionMemo.value(s, dir, "ccnet_sample_rows") {
        cutRows.map(_.getAs[Long]("n_samp")).sum
      }
      requireBoundedSample(s, sampleRows)
      import scala.jdk.CollectionConverters._
      // re-attach as a LOCAL literal relation: the labeling plan now has
      // zero Window operators by construction (CurationSpec pins this)
      val cuts = s.createDataFrame(cutRows.asJava, cutsAgg.schema).drop("n_samp")
      a.join(broadcast(cuts), Seq("lang"), "left")
        .select(col("doc_id"), col("lang"), col("avg_neg_logprob"),
          when(col("avg_neg_logprob").isNull || col("cut1").isNull, "unscored")
            .when(col("avg_neg_logprob") <= col("cut1"), "head")
            .when(col("avg_neg_logprob") <= col("cut2"), "middle")
            .otherwise("tail").as("bucket"))
        .orderBy(col("doc_id"))
    })

  def queries: Seq[GraftQuery] = Seq(surprisal, ccnet)
}
