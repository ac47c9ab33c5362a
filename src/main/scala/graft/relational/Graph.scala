package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics on relational data (extension family E6,
  * continued): PageRank over the supplier co-supply graph — suppliers
  * are linked when they supply line items of the same order. Iterative
  * join+aggregate is the one plan shape Catalyst cannot fuse away, so
  * this exercises the "driver-side loop over a persisted distributed
  * frame" pattern (same family as the connected-components dedup
  * clusters, `llmops/LlmOps.scala`).
  *
  * Scale notes: the edge list is built by a self-join on l_orderkey —
  * co-partitioned single shuffle, per-order fan-out bounded by orders'
  * line count (≤ 7², and DISTINCT collapses repeats). Edges persist
  * ONCE and every iteration reuses them; each iteration is one shuffle
  * (group by dst). Ranks are O(|nodes|) — always the small side, so the
  * rank⋈edge join broadcasts the ranks and never reshuffles the edge
  * list. Contributions quantize to exact integers before summing, so the
  * result is order-insensitive and bit-identical across engines and
  * partitionings.
  */
object Graph {

  private val iterations = 3
  private val damping = 0.85

  /** WEIGHTED canonical co-supply pairs (src < dst, w = number of
    * orders the pair co-supplied) — the ONE fact-scanning aggregate
    * both graph queries derive from. Built as per-order supplier set +
    * pair fan-out instead of a fact self-join: ONE shuffle input (the
    * join shape shuffles the fact twice), the per-order set is
    * line-count-bounded (≤7), and the ≤ k² generator fan-out happens
    * after the aggregate — measured ~15% faster and strictly less
    * shuffle I/O at scale. The oracles keep the self-join spelling;
    * the pair/weight sets are identical by construction. Released by
    * the harness's SessionMemo.clear(). */
  private def cosupplyPairsW(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "cosupply_pairs_w") {
      T(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_suppkey")).as("ss"))
        .select(explode(expr(
          "flatten(transform(ss, x -> transform(ss, y -> struct(x AS src, y AS dst))))"))
          .as("e"))
        .select(col("e.src"), col("e.dst"))
        .where(col("src") < col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    }

  /** The degree-attached both-direction edge frame (src, dst, outdeg)
    * PageRank re-joins every iteration (attaching outdeg per round
    * measured ~35% of the query) — derived from [[cosupplyPairsW]] by
    * mirroring the canonical pairs, so sessions running both graph
    * queries pay the fact scan once. */
  private def cosupplyEdges(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "cosupply_edges_w") {
      val canon = cosupplyPairsW(s, dir).select("src", "dst")
      val edges = canon.unionByName(
        canon.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .toDF("d_src", "outdeg")
      edges.join(deg, col("src") === col("d_src"))
        .select("src", "dst", "outdeg")
    }

  /** PageRank, 3 unrolled iterations, d=0.85, rank0 = 1.0.
    *
    * Contribution discipline: `rank/outdeg` is a deterministic double
    * division (identical inputs ⇒ identical quotient in both engines);
    * each contribution then quantizes to an exact integer by TRUNCATING
    * `quotient × 1e12` toward zero — truncation has no rounding ties, so
    * the quantities (and their exact decimal-backed sums, in any order)
    * are bit-identical across engines. A decimal CAST would not be:
    * Spark rounds the double's shortest string rendering where DuckDB
    * rounds the exact binary value, and near the scale limit the two
    * disagree often enough to flake at sf≥0.1 (measured on the label-
    * centroid query). One double multiply/add per node then produces the
    * next rank. The oracle unrolls the same three iterations as chained
    * CTEs (a recursive CTE with aggregation in the recursive term is not
    * portable SQL).
    */
  private val pagerank = GraftQuery(
    "q_pagerank_cosupply",
    "PageRank over the supplier co-supply graph: persisted edges, 3 exact-decimal iterations (E6)",
    Some {
      def step(prev: String): String =
        s"""SELECT e.dst AS node,
               CAST(${1 - damping} + $damping *
                 (${graft.T.sqlDec2Dbl("SUM(CAST(trunc(r.rank / d.outdeg * 1e12) AS DECIMAL(20,0)))")}
                  / 1e12) AS DOUBLE) AS rank
            FROM $prev r
            JOIN deg d ON d.src = r.node
            JOIN edges e ON e.src = r.node
            GROUP BY e.dst"""
      s"""
      WITH edges AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey <> b.l_suppkey),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
      r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
      r1 AS (${step("r0")}),
      r2 AS (${step("r1")}),
      r3 AS (${step("r2")})
      SELECT node AS s_suppkey, rank AS pagerank FROM r3 ORDER BY node"""
    },
    (s, dir) => {
      val edgesW = cosupplyEdges(s, dir)
      // toDF re-aliases per use: iteration N's plan embeds iteration
      // N-1's, so re-joining the same edge frame verbatim would trip
      // Spark's ambiguous-self-join detection on repeated attribute ids.
      var ranks = edgesW.select(col("src").as("node"), col("outdeg"))
        .distinct().select(col("node"), lit(1.0).as("rank"))
      for (_ <- 1 to iterations) {
        // exact truncation toward zero via q - (q % 1.0): IEEE
        // remainder is exact, so the result is DuckDB trunc() of the
        // same binary quotient bit-for-bit, and — unlike a long cast —
        // it cannot saturate/wrap when a hub node's rank/outdeg
        // quotient exceeds ~9.2e6 at extreme scale (integral doubles
        // convert exactly to DECIMAL(20,0) in both engines). Projected
        // BEFORE the groupBy so the quotient is evaluated once per row
        // — inside the partial agg, codegen does not subexpression-
        // eliminate the q repeated in (q - q % 1), which cost 2× on
        // this query when spelled inline.
        val q = col("rank") / col("outdeg2") * 1e12
        ranks = ranks
          .join(edgesW.toDF("e_src", "dst", "outdeg2"),
            col("node") === col("e_src"))
          .select(col("dst"),
            (q - (q % lit(1.0))).cast(DecimalType(20, 0)).as("contrib"))
          .groupBy(col("dst"))
          .agg((lit(1 - damping) + lit(damping) *
            (sum(col("contrib")).cast("double") / 1e12))
            .cast("double").as("rank"))
          .select(col("dst").as("node"), col("rank"))
      }
      ranks.select(col("node").as("s_suppkey"), col("rank").as("pagerank"))
        .orderBy(col("s_suppkey"))
    })

  /** How many strongest ties the triangle census keeps. A fixed-size
    * backbone is what makes the census runnable at ANY data scale: the
    * raw co-supply graph densifies toward completeness as orders grow
    * (measured: 91% complete at sf0.1 — 1000 suppliers, 453k edges),
    * so an unthresholded census is Θ(n³) no matter the engine. Keeping
    * the top-K heaviest edges (co-supply count, ties broken by key, a
    * total order → deterministic) is standard weighted-network
    * backbone extraction, and bounds every downstream join by K. */
  private val backboneK = 5000

  /** Triangle census + global clustering coefficient of the co-supply
    * BACKBONE — the strongest [[backboneK]] supplier ties by co-supply
    * count. Plan shape: one weighted pair aggregate (same set-fan-out
    * build as [[cosupplyEdges]] — the fact shuffles once), a global
    * top-K (TakeOrdered — no full sort at scale), then the textbook
    * wedge join over the K-bounded edge list: e1(a,b) ⋈ e2(a,c) on the
    * shared LOW endpoint with b < c generates each candidate wedge
    * once, and a left-semi join against the edge set closes it,
    * co-partitioned on the edge key. Wedge count Σ d(d-1)/2 stays in
    * exact integer arithmetic (DIV, never FP division); the
    * coefficient is one deterministic double division. */
  private val triangleCensus = GraftQuery(
    "q_triangle_count_cosupply",
    s"triangle census + clustering coefficient of the top-$backboneK co-supply backbone (E6)",
    Some(s"""
      WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      p AS (
        SELECT a.l_suppkey AS src, b.l_suppkey AS dst, COUNT(*) AS w
        FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey < b.l_suppkey
        GROUP BY 1, 2),
      e AS (SELECT src, dst FROM p ORDER BY w DESC, src, dst LIMIT $backboneK),
      nd AS (
        SELECT v, COUNT(*) AS d FROM (
          SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e)
        GROUP BY v),
      w AS (SELECT CAST(SUM(d * (d - 1)) AS BIGINT) // 2 AS n_wedges FROM nd),
      t AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
        JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      ne AS (SELECT COUNT(*) AS n_edges FROM e)
      SELECT ne.n_edges, w.n_wedges, t.n_triangles,
             CAST(3.0 * t.n_triangles / NULLIF(w.n_wedges, 0) AS DOUBLE) AS clustering_coeff
      FROM ne, w, t"""),
    (s, dir) => {
      // deterministic global top-K over the shared weighted pair frame
      // ([[cosupplyPairsW]] — the census and PageRank split one fact
      // scan). MATERIALIZED through the memo: the census consumes the
      // backbone from five plan branches (edge count, both degree
      // projections, both wedge-join sides), and an unpersisted frame
      // would re-run the top-K once per branch (measured 2.6s → 1.9s
      // after materializing; at 100 TB that is five fact scans saved
      // for a ≤K-row cache).
      val backbone = graft.SessionMemo.materialized(s, dir, "cosupply_backbone") {
        cosupplyPairsW(s, dir)
          .orderBy(col("w").desc, col("src"), col("dst"))
          .limit(backboneK)
          .select(col("src"), col("dst"))
      }
      val nEdges = backbone.agg(count(lit(1)).as("n_edges"))
      val nWedges = backbone.select(col("src").as("v"))
        .unionByName(backbone.select(col("dst").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
        .agg(sum(col("d") * (col("d") - 1)).as("s2"))
        .select(expr("s2 DIV 2").as("n_wedges"))
      val nTriangles = backbone.toDF("a", "b")
        .join(backbone.toDF("a2", "c"),
          col("a") === col("a2") && col("c") > col("b"))
        .select(col("b"), col("c"))
        .join(backbone.toDF("b", "c"), Seq("b", "c"), "left_semi")
        .agg(count(lit(1)).as("n_triangles"))
      nEdges.crossJoin(broadcast(nWedges)).crossJoin(broadcast(nTriangles))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          // zero-wedge guard (degenerate backbone, e.g. a perfect
          // matching): Spark's non-ANSI x/0 yields NULL while DuckDB's
          // IEEE double division yields Inf/NaN — NULLIF in the oracle
          // + an explicit null here keep the engines aligned (the same
          // safeDiv discipline as Profile.scala). Unreachable on real
          // co-supply data; latent cross-engine divergence otherwise.
          when(col("n_wedges") === 0, lit(null).cast("double"))
            .otherwise((lit(3.0) * col("n_triangles") / col("n_wedges"))
              .cast("double")).as("clustering_coeff"))
    })

  def queries: Seq[GraftQuery] = Seq(pagerank, triangleCensus)
}
