package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval + distribution analysis (extension family E4,
  * continued): BM25 keyword retrieval, bigram collocation mining, and
  * quantile-boundary bucketing — the ranked-search and corpus-statistics
  * ops a training-data pipeline runs when curating by topic or auditing
  * the quality distribution.
  *
  * Determinism discipline (same as [[TextRanking]]): every score is a
  * fixed parenthesization of IEEE-754 double ops over exact integer
  * inputs, written identically in the Spark plan and the DuckDB oracle —
  * both engines round each op identically, so results are bit-equal
  * with no tolerance or rounding step. Logarithm-free variants are used
  * throughout (rational BM25 idf, lift instead of log-PMI): libm log is
  * the one op that can differ in the last ulp between engines, and every
  * ranking these queries produce is invariant under the monotone
  * transform.
  */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")
  private def toks(text: Column): Column = split(text, " ", -1)

  /** Fixed query-term set for the BM25 CONTRACT query — three
    * mid-frequency terms from the synthetic vocabulary, pinned so the
    * oracle is closed-form. A real deployment calls [[bm25TopDocs]]
    * with its own terms (RetrievalSpec exercises a different set). */
  private[llmops] val bm25Terms = Seq("join", "scan", "filter")

  /** BM25 top-10 documents per query term (k1 = 1.2, b = 0.75), with a
    * rational idf `(N - df + 0.5) / (df + 0.5)` — the standard BM25 idf
    * minus the log, which preserves per-term ranking (log is monotone)
    * while keeping the score a short chain of exact-input double ops.
    *
    * Scale shape: the term filter lands BEFORE the tf aggregation, so
    * the explode → filter → agg pipeline only shuffles rows for the
    * query terms (|terms| × docs-containing-term, not the full
    * posting list); doc lengths come straight off the documents scan
    * (no second explode); N/avgdl is a 1-row broadcast; the final
    * per-term top-10 is a bounded window over |terms| partitions of
    * df(term) rows. At 100 TB the only wide plan edges are the tf
    * aggregation (keyed by doc × query-term) and the small window. */
  private val bm25 = GraftQuery(
    "llm_e4_bm25_topdocs",
    "BM25 (rational idf) top-10 docs per query term (E4)",
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      stats AS (
        SELECT COUNT(*) AS n, CAST(CAST((SUM(dl)) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
        GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      scored AS (
        -- every fractional constant CAST to DOUBLE: a bare 0.5 is a DECIMAL
        -- literal in DuckDB and the decimal-typed chain diverges last-ulp
        -- against the Spark-side double chain
        SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
               ((stats.n - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
                 * ((tf.tf * CAST(2.2 AS DOUBLE))
                    / (tf.tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                          * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))) AS score
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rk
        FROM scored)
      SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl, score
      FROM ranked WHERE rk <= 10
      ORDER BY term, score DESC, doc_id"""),
    (s, dir) => bm25TopDocs(s, dir, bm25Terms))

  /** Reusable BM25 retrieval over the documents table: top-`k` docs per
    * term in `terms` (k1 = 1.2, b = 0.75, rational idf — see the
    * contract query's doc for the scale shape and the determinism
    * discipline). `terms` is the caller's query set; the registry entry
    * pins [[bm25Terms]] so its oracle stays closed-form. */
  def bm25TopDocs(s: SparkSession, dir: String, terms: Seq[String],
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
    bm25Scored(s, dir, terms).withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("score"))
      .orderBy(col("term"), col("score").desc, col("doc_id"))
  }

  /** The per-(term, doc) BM25-scored candidate frame both the top-k
    * query and the RRF fusion consume: one row per query term per doc
    * containing it, with tf, dl, and the rational-idf BM25 score. */
  private def bm25Scored(s: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val d = docs(s, dir)
    val tok = d.select(col("doc_id"), explode(toks(col("text"))).as("term"))
    val dl = d.select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = tok
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), "term") // |terms| rows
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // 1-row scalar
      .withColumn("score",
        ((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) *
              (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two
    * genuinely different lexical rankers over the same candidates:
    * BM25 (length-normalized) and raw term frequency (not). RRF is the
    * standard way hybrid retrieval combines rankers whose scores are
    * not calibrated against each other — only RANKS enter the fused
    * score, sum(1 / (60 + rank_i)), so the fusion is immune to score
    * scale and, here, to cross-engine floating-point score noise: both
    * ranks are integers from (score, doc_id)-ordered windows, the two
    * reciprocals are exact-input double divisions added in one fixed
    * order, and ties in the fused score (rank pairs like (1,4)/(4,1)
    * sum identically) break on doc_id.
    *
    * The ranks are dense_rank, NOT row_number, and the distinction is
    * the duplicate-key axis (§2b-x): ranks are EMITTED columns here, and
    * a duplicate-committed doc ties both windows on their full
    * (score, doc_id) order — row_number would split the tie by engine
    * sort luck and the two copies could carry CROSSED (r_bm25, r_tf)
    * pairs on different engines; dense_rank gives identical copies
    * identical ranks (and is exactly row_number on any corpus without
    * duplicate keys). The final top-10 cut stays row_number: its tie
    * groups are byte-identical rows, so which copy survives the cut is
    * unobservable in the output multiset.
    *
    * Scale shape: everything downstream of the one tf aggregation the
    * BM25 query already pays — two bounded row_number windows over
    * |terms| partitions of df(term) rows, a column-append of two
    * reciprocals, and a third bounded window for the final top-10. No
    * new corpus-sized edge; at 100 TB the added cost over plain BM25 is
    * the second window over the same per-term candidate sets. */
  private val rrfFusion = GraftQuery(
    "llm_e4_rrf_fusion",
    "reciprocal-rank fusion of BM25 and raw-tf rankings, top-10 per term (E4)",
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
      stats AS (
        SELECT COUNT(*) AS n, CAST(CAST((SUM(dl)) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok
        WHERE term IN (${bm25Terms.map(t => s"'$t'").mkString(", ")})
        GROUP BY doc_id, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      scored AS (
        SELECT tf.term, tf.doc_id, tf.tf,
               ((stats.n - df.df + CAST(0.5 AS DOUBLE)) / (df.df + CAST(0.5 AS DOUBLE)))
                 * ((tf.tf * CAST(2.2 AS DOUBLE))
                    / (tf.tf + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE)
                          * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))) AS score
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
      ranked AS (
        SELECT term, doc_id,
               dense_rank() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS r_bm25,
               dense_rank() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r_tf
        FROM scored),
      fused AS (
        SELECT term, doc_id, r_bm25, r_tf,
               CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_bm25)
                 + CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + r_tf) AS rrf_score
        FROM ranked),
      topk AS (
        SELECT *, row_number() OVER (PARTITION BY term ORDER BY rrf_score DESC, doc_id) AS rk
        FROM fused)
      SELECT term, doc_id, r_bm25, r_tf, rrf_score
      FROM topk WHERE rk <= 10
      ORDER BY term, rrf_score DESC, doc_id"""),
    (s, dir) => {
      val scored = bm25Scored(s, dir, bm25Terms)
      val wBm = Window.partitionBy(col("term")).orderBy(col("score").desc, col("doc_id"))
      val wTf = Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))
      val fused = scored
        .withColumn("r_bm25", dense_rank().over(wBm).cast("long"))
        .withColumn("r_tf", dense_rank().over(wTf).cast("long"))
        .withColumn("rrf_score",
          lit(1.0) / (lit(60.0) + col("r_bm25")) + lit(1.0) / (lit(60.0) + col("r_tf")))
      val wK = Window.partitionBy(col("term")).orderBy(col("rrf_score").desc, col("doc_id"))
      fused.withColumn("rk", row_number().over(wK))
        .filter(col("rk") <= 10)
        .select(col("term"), col("doc_id"), col("r_bm25"), col("r_tf"), col("rrf_score"))
        .orderBy(col("term"), col("rrf_score").desc, col("doc_id"))
    })

  /** Bigram collocations ranked by lift = P(xy) / (P(x)·P(y)) — log-free
    * PMI. Counts: n_xy over adjacent token pairs, n_x over all unigram
    * occurrences, with 1-row totals broadcast. Top-50 with a (w1, w2)
    * tie-break so the LIMIT is a total order.
    *
    * Scale shape: two aggregations (bigram counts keyed by pair, unigram
    * counts keyed by term), two shuffled joins of the min-support-
    * filtered bigram table against the unigram table (both keyed on the
    * join term — no broadcast assumption, the vocabulary scales with
    * data), and a TakeOrderedAndProject for the top-50 (no global sort
    * materialization). The n_xy >= 5 min-support filter runs before the
    * joins, shrinking the pair table at the source. */
  private val bigramLift = GraftQuery(
    "llm_e4_bigram_collocations",
    "top-50 bigram collocations by lift (log-free PMI), min support 5 (E4)",
    Some("""
      WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      uni AS (
        SELECT u.term, COUNT(*) AS n_x
        FROM (SELECT unnest(toks) AS term FROM tok) u GROUP BY u.term),
      tot AS (SELECT CAST(CAST((SUM(n_x)) AS VARCHAR) AS DOUBLE) AS n_uni FROM uni),
      idx AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM tok WHERE len(toks) >= 2),
      bg AS (
        SELECT toks[i] AS w1, toks[i+1] AS w2, COUNT(*) AS n_xy
        FROM idx GROUP BY 1, 2 HAVING COUNT(*) >= 5),
      btot AS (
        SELECT CAST(CAST((SUM(n_xy)) AS VARCHAR) AS DOUBLE) AS n_bi FROM (
          SELECT COUNT(*) AS n_xy
          FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
                FROM tok WHERE len(toks) >= 2) z
          GROUP BY z.toks[z.i], z.toks[z.i+1]) g)
      SELECT bg.w1, bg.w2, bg.n_xy,
             (CAST(bg.n_xy AS DOUBLE) / a.n_x) * (tot.n_uni / btot.n_bi) * (tot.n_uni / b.n_x) AS lift
      FROM bg
      JOIN uni a ON bg.w1 = a.term
      JOIN uni b ON bg.w2 = b.term
      CROSS JOIN tot CROSS JOIN btot
      ORDER BY lift DESC, w1, w2 LIMIT 50"""),
    (s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), toks(col("text")).as("toks"))
      val uni = tok
        .select(explode(col("toks")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n_x"))
      val tot = uni.agg(sum(col("n_x")).cast("double").as("n_uni"))
      // all adjacent pairs; guard size >= 2 (Spark's sequence(1, 0) would
      // produce a DESCENDING range, not an empty one)
      val bgAll = tok
        .filter(size(col("toks")) >= 2)
        .select(col("toks"), explode(sequence(lit(1), size(col("toks")) - 1)).as("i"))
        .select(
          element_at(col("toks"), col("i")).as("w1"),
          element_at(col("toks"), col("i") + 1).as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      val btot = bgAll.agg(sum(col("n_xy")).cast("double").as("n_bi"))
      val bg = bgAll.filter(col("n_xy") >= 5)
      bg
        .join(uni.as("a"), col("w1") === col("a.term"))
        .join(uni.as("b"), col("w2") === col("b.term"))
        .crossJoin(broadcast(tot))
        .crossJoin(broadcast(btot))
        .withColumn("lift",
          (col("n_xy").cast("double") / col("a.n_x")) *
            (col("n_uni") / col("n_bi")) *
            (col("n_uni") / col("b.n_x")))
        .select(col("w1"), col("w2"), col("n_xy"), col("lift"))
        .orderBy(col("lift").desc, col("w1"), col("w2"))
        .limit(50)
    })

  /** Quality-score deciles WITHOUT a global sort: compute the 9 decile
    * boundaries as RANK-BASED (type-1 / lower) quantiles — boundary i
    * is the smallest score whose cumulative count reaches
    * ceil(i·n/10) — broadcast them, and assign each doc
    * `decile = 1 + #(boundaries < score)`; the scalable alternative to
    * `ntile(10) OVER (ORDER BY score)`, whose single ORDER BY
    * partition is the classic 100 TB scale killer. Boundary assignment
    * is stable under ties (equal scores always land in the same
    * decile; ntile splits them by row position).
    *
    * Rank-based (not interpolated) boundaries are what make the query
    * engine-exact: an interpolated percentile lerps between two data
    * values with engine-LOCAL arithmetic, and with heavy ties (ratio
    * scores) the boundary lands within an ulp of a data value — a doc
    * whose score equals that value could then flip deciles in one
    * engine only. A rank-based boundary IS a data value (here an exact
    * single division of two ints), so `score > boundary` compares
    * bit-identical doubles, and the threshold ceil(i·n/10) is integer
    * arithmetic: (i·n + 9) div 10 in both engines. The cumulative
    * window runs over DISTINCT score values, whose count is bounded by
    * the token-length cap (a ratio d/t with d ≤ t ≤ max_tokens), NOT
    * by corpus size — the unpartitioned window is safe at 100 TB. */
  private val qualityDeciles = GraftQuery(
    "llm_e4_quality_deciles",
    "quality-score deciles via broadcast rank-based boundaries, no global sort (E4)",
    Some {
      val bDefs = (1 to 9).map(i =>
        s"min(CASE WHEN cum >= ($i * tot.n + 9) // 10 THEN score END) AS b$i")
        .mkString(",\n               ")
      val decileExpr = (1 to 9)
        .map(i => s"(CASE WHEN q.score > b.b$i THEN 1 ELSE 0 END)")
        .mkString("1 + ", " + ", "")
      s"""
      WITH q AS (
        SELECT * FROM (
          SELECT doc_id,
                 CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS score
          FROM documents)
        WHERE score IS NOT NULL),
      vals AS (SELECT score, count(*) AS c FROM q GROUP BY score),
      tot AS (SELECT count(*) AS n FROM q),
      cum AS (
        SELECT score, sum(c) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM vals),
      b AS (
        SELECT $bDefs
        FROM cum CROSS JOIN tot)
      SELECT CAST($decileExpr AS BIGINT) AS decile,
             COUNT(*) AS n_docs, MIN(q.score) AS min_score, MAX(q.score) AS max_score
      FROM q CROSS JOIN b
      GROUP BY 1 ORDER BY decile"""
    },
    (s, dir) => {
      val q = docs(s, dir).select(
        col("doc_id"),
        (size(array_distinct(toks(col("text")))).cast("double") /
          size(toks(col("text")))).as("score"))
        // a null text has no score — UNRANKABLE, excluded from decile
        // bucketing on both sides. Without the filter, NULL scores hit
        // the cumulative window's null-ordering divergence (Spark ASC
        // defaults NULLS FIRST, DuckDB NULLS LAST) and shift every
        // boundary (measured, round-11 null-injection gate).
        .filter(col("score").isNotNull)
      val vals = q.groupBy(col("score")).agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("score"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cum = vals.withColumn("cum", sum(col("c")).over(w))
        .crossJoin(broadcast(q.agg(count(lit(1)).as("n"))))
      val bAggs = (1 to 9).map(i =>
        min(when(col("cum") >= expr(s"($i * n + 9) div 10"), col("score"))).as(s"b$i"))
      val b = cum.agg(bAggs.head, bAggs.tail: _*)
      val decile = (1 to 9)
        .map(i => when(col("score") > col(s"b$i"), 1L).otherwise(0L))
        .foldLeft(lit(1L))(_ + _)
      q.crossJoin(broadcast(b)) // 1-row boundary vector
        .withColumn("decile", decile)
        .groupBy(col("decile"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("score")).as("min_score"),
          max(col("score")).as("max_score"))
        .orderBy(col("decile"))
    })

  /** Vocabulary coverage audit: build the top-1000 vocabulary (frequency
    * desc, term asc — a total order, so the cut is deterministic), then
    * per-language OOV statistics. The "will my tokenizer cover this
    * corpus" question every training-data curation pass asks.
    *
    * Determinism: per-language counts are exact integers; the single
    * `oov_rate` division happens once per output row on exact inputs —
    * no floating-point accumulation anywhere.
    *
    * Scale shape: the vocab cut is `orderBy(...).limit(k)` — Spark plans
    * TakeOrderedAndProject (per-partition top-k, then a k-row merge),
    * NOT a global sort; k rows then broadcast into the membership join,
    * so the token stream is scored map-side with zero extra shuffles.
    * The only wide edges are the term-count aggregate and the final
    * per-language rollup. At vocab sizes past broadcast range, the
    * membership join degrades gracefully to a shuffled left-semi on
    * term. */
  private val vocabOov = GraftQuery(
    "llm_e4_vocab_oov",
    "top-1000 vocabulary + per-language OOV rate via broadcast membership join (E4)",
    Some("""
      WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term FROM documents),
      vocab AS (
        SELECT term FROM (
          SELECT term, COUNT(*) AS n FROM tok GROUP BY term
          ORDER BY n DESC, term LIMIT 1000)),
      scored AS (
        SELECT t.lang, t.term, (v.term IS NOT NULL) AS in_vocab
        FROM tok t LEFT JOIN vocab v ON t.term = v.term)
      SELECT lang,
             COUNT(*) AS n_tokens,
             CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
             CAST(SUM(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) AS oov_rate
      FROM scored GROUP BY lang ORDER BY lang"""),
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("term"))
      val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term"))
        .limit(1000)
        .select(col("term"), lit(true).as("in_vocab_m"))
      tok
        .join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab_m"), 0L).otherwise(1L)).as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
        .orderBy(col("lang"))
    })

  def queries: Seq[GraftQuery] = Seq(bm25, rrfFusion, bigramLift, qualityDeciles, vocabOov)
}
