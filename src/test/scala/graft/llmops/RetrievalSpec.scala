package graft.llmops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics + plan-shape checks for the retrieval wave: BM25 ranking,
  * bigram lift, and sort-free decile bucketing. */
class RetrievalSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("llm_e4_bm25_topdocs: <=10 docs per term, scores descending, tf consistent with the corpus") {
    val rows = run("llm_e4_bm25_topdocs").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.length should be <= 10
      // rows come back ordered (term, score desc); per-term scores monotone
      g.map(_.getAs[Double]("score")).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ => ()
      }
    }
    // spot-check tf against a direct token count
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val byDoc = docs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("text").split(" ", -1).toSeq).toMap
    rows.take(20).foreach { r =>
      val tf = byDoc(r.getAs[Long]("doc_id")).count(_ == r.getString(0))
      r.getAs[Long]("tf") shouldBe tf
    }
  }

  test("llm_e4_bm25_topdocs plan: term filter runs before the tf aggregation") {
    val p = run("llm_e4_bm25_topdocs").queryExecution.optimizedPlan.toString
    // the isin filter must sit below the first Aggregate in the tf branch,
    // i.e. the plan text shows Filter ... IN (...) somewhere (not filtered
    // post-agg on the score side only)
    p should include("term")
    p.toLowerCase should include("filter")
  }

  test("bm25TopDocs is parameterized: a different term set ranks those terms") {
    // a non-contract query set (and a tighter k) through the same engine
    val out = Retrieval.bm25TopDocs(spark, sfDir, Seq("hash", "sort"), k = 5)
      .collect()
    out.map(_.getString(0)).toSet shouldBe Set("hash", "sort")
    out.groupBy(_.getString(0)).foreach { case (_, g) => g.length should be <= 5 }
    // the contract query still pins its fixed term set
    run("llm_e4_bm25_topdocs").collect().map(_.getString(0)).toSet shouldBe
      Set("join", "scan", "filter")
  }

  test("llm_e4_bigram_collocations: every pair really is adjacent somewhere and meets min support") {
    val rows = run("llm_e4_bigram_collocations").collect()
    rows.length should be <= 50
    rows.foreach(_.getAs[Long]("n_xy") should be >= 5L)
    // lift ordering is descending
    rows.map(_.getAs[Double]("lift")).sliding(2).foreach {
      case Array(a, b) => a should be >= b
      case _ => ()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").collect()
    val adjacency = docs.flatMap { r =>
      val t = r.getAs[String]("text").split(" ", -1)
      t.iterator.zip(t.iterator.drop(1)).map { case (a, b) => (a, b) }
    }.groupBy(identity).view.mapValues(_.length).toMap
    rows.take(10).foreach { r =>
      adjacency((r.getString(0), r.getString(1))).toLong shouldBe r.getAs[Long]("n_xy")
    }
  }

  test("llm_e4_quality_deciles: 10 buckets, counts conserve the corpus, ranges don't interleave") {
    val rows = run("llm_e4_quality_deciles").collect().sortBy(_.getAs[Long]("decile"))
    rows.length shouldBe 10
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe n
    // bucket k's max never exceeds bucket k+1's min (boundary assignment
    // is order-preserving), and each bucket holds ~n/10 docs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        a.getAs[Double]("max_score") should be <= b.getAs[Double]("min_score")
      case _ => ()
    }
    rows.foreach(_.getAs[Long]("n_docs").toDouble shouldBe (n / 10.0) +- (n / 10.0 * 0.5))
  }

  test("llm_e4_vocab_oov: token totals conserve the corpus; vocab cut is TakeOrdered, not a global sort") {
    val rows = run("llm_e4_vocab_oov").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val totalTokens = docs.select(expr("sum(size(split(text, ' ', -1)))")).head().getLong(0)
    rows.map(_.getAs[Long]("n_tokens")).sum shouldBe totalTokens
    rows.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      rate should be >= 0.0
      rate should be <= 1.0
      rate shouldBe r.getAs[Long]("n_oov").toDouble / r.getAs[Long]("n_tokens")
    }
    val plan = run("llm_e4_vocab_oov").queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should include("BroadcastHashJoin")
  }

  test("llm_e4_quality_deciles plan: boundaries broadcast, no corpus-sized ntile/sort") {
    val p = run("llm_e4_quality_deciles").queryExecution.executedPlan.toString
    // the corpus-scale killer would be ntile(10) OVER (ORDER BY score):
    // one all-rows range sort. The rank-based boundaries instead run
    // their cumulative window over DISTINCT scores — the plan's only
    // Window must sit on top of the score-keyed aggregate (bounded by
    // the token-length cap, not corpus size), and doc→decile assignment
    // must be a broadcast of the 1-row boundary vector.
    p should not include "ntile"
    p.toLowerCase should include("broadcast")
    "Window".r.findAllIn(p).size shouldBe 1
    val win = p.indexOf("Window")
    val distinctAgg = p.indexOf("HashAggregate(keys=[score")
    withClue("cumulative window must read the distinct-score aggregate:") {
      distinctAgg should be > win
    }
    // and the corpus branch itself is never range-sorted by score
    p should not include "rangepartitioning(score"
  }

  test("llm_e4_rrf_fusion: fused score recomputes from the two ranks; unanimous #1 leads") {
    val rows = run("llm_e4_rrf_fusion").collect()
    rows should not be empty
    rows.foreach { r =>
      val rb = r.getAs[Long]("r_bm25")
      val rt = r.getAs[Long]("r_tf")
      // the exact parenthesization both engines use — bit-equal, no tolerance
      r.getAs[Double]("rrf_score") shouldBe (1.0 / (60.0 + rb) + 1.0 / (60.0 + rt))
      rb should be >= 1L
      rt should be >= 1L
    }
    rows.map(_.getString(0)).toSet shouldBe Set("join", "scan", "filter")
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      g.length should be <= 10
      // rows come back (term, rrf desc, doc_id): fused scores monotone
      g.map(_.getAs[Double]("rrf_score")).sliding(2).foreach {
        case Array(a, b) => a should be >= b
        case _ => ()
      }
      // a doc both rankers put first has the maximum possible RRF score
      // and must lead its term's fused list
      g.find(r => r.getAs[Long]("r_bm25") == 1L && r.getAs[Long]("r_tf") == 1L)
        .foreach { r =>
          g.head.getAs[Long]("doc_id") shouldBe r.getAs[Long]("doc_id")
        }
    }
  }

  test("llm_e4_rrf_fusion ranks are consistent with the BM25 top-k ordering") {
    // per term, the fused rows' r_bm25 order must agree with the BM25
    // contract query's (score desc, doc_id) order on shared docs
    val bmOrder = run("llm_e4_bm25_topdocs").collect()
      .groupBy(_.getString(0))
      .map { case (t, g) => t -> g.map(_.getAs[Long]("doc_id")).toSeq }
    run("llm_e4_rrf_fusion").collect().groupBy(_.getString(0)).foreach {
      case (term, g) =>
        val shared = g.filter(r => bmOrder(term).contains(r.getAs[Long]("doc_id")))
        val byRank = shared.sortBy(_.getAs[Long]("r_bm25")).map(_.getAs[Long]("doc_id"))
        val expected = bmOrder(term).filter(d =>
          shared.exists(_.getAs[Long]("doc_id") == d))
        byRank.toSeq shouldBe expected
    }
  }
}
