package graft.llmops

import graft.{SparkSpec, T}
import org.apache.spark.sql.functions._

/** Suite-level pin of the shingle df-cap's bounding mechanism (the
  * scale claim DupProbe measures at sf0.1): on a duplicate-heavy
  * corpus, candidate-pair cardinality from the inverted-index join is
  * quadratic in clique size WITHOUT the cap and collapses to the
  * non-clique residue WITH it, because every template shingle's df
  * equals the clique size and the cap drops shingles past it.
  *
  * Runs at sf0.001 (500 docs) with a parameterized cap of 100 so the
  * mechanism engages without sf0.1 volume: 90% duplicates → template
  * shingle df ≈ 450 > 100 → dropped. The production cap (1000) and
  * corpus-scale counts are DupProbe's territory (PLANS.md round 13);
  * this spec keeps the mechanism from silently regressing (e.g. a
  * future cap applied after the join instead of before it would pass
  * every oracle gate — no shingle reaches the production cap at test
  * SFs — but lose the 100 TB bound this spec fails loudly on). */
class DupCapSpec extends SparkSpec {

  // ONE recipe, two consumers: the spec pins the same duplicate
  // encoding DupProbe measures at sf0.1 and the oracle gate consumes —
  // a private copy here could drift from what the probe receipts mean
  private lazy val dupDir: String = {
    val dir = graft.DupProbe.buildDupDir(spark, sfDir, 90)
    graft.SessionMemo.clear(spark)
    dir
  }

  private def candidates(cap: Int): Long = {
    val sh = LlmOps.shinglesCapped(spark, dupDir, cap)
    sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
  }

  test("the df-cap drops clique shingles BEFORE the join, bounding candidates") {
    val nDup = T(spark, dupDir, "documents")
      .filter(col("doc_id") % 100 < 90).count()
    val cliqueFloor = nDup * (nDup - 1) / 2 // ≥ C(450, 2) = 101 025
    val uncapped = candidates(Int.MaxValue)
    val capped = candidates(100)
    withClue(s"uncapped=$uncapped cliqueFloor=$cliqueFloor") {
      assert(uncapped >= cliqueFloor,
        "uncapped join must pay at least the full clique")
    }
    // capped: template shingles (df ≈ 450 > 100) are gone; what remains
    // is the non-duplicate residue (≈50 docs) plus per-doc unique
    // suffixes — orders of magnitude below the clique
    withClue(s"capped=$capped cliqueFloor=$cliqueFloor") {
      assert(capped < cliqueFloor / 10,
        "df-cap failed to bound the duplicate clique's candidates")
    }
  }
}
