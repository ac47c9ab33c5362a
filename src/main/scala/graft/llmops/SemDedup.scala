package graft.llmops

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication in embedding space (Abbas et al.
  * 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"): k-means-cluster the embeddings, compute
  * pairwise cosine WITHIN each cluster only, and keep one representative
  * per semantic-duplicate group. This is the embedding-space complement
  * of the token-space near-dup family (`llm_e2_minhash_*`): MinHash
  * finds REWORDINGS of the same bytes; SemDeDup finds REPHRASINGS of
  * the same content that share no n-grams at all.
  *
  * Published keep-rule, published one-pass implementation: within a
  * cluster, order items by (cosine-to-centroid ASC, id) — LOW centroid
  * similarity first, the paper's "keep the outliers" diversity rule —
  * and drop an item iff some EARLIER item in that order is within
  * cosine ≥ [[SemDedup.semTau]] of it (the paper's upper-triangular
  * max-similarity test; one pairs pass, no iteration — a dropped item
  * can still shadow later items, which is exactly what the reference
  * implementation's triu matrix does).
  *
  * The coarse quantizer is the SAME memoized seeded-Lloyd fit the IVF /
  * IVF-PQ queries share ([[ProductQuant.ivfCentroids]] — one fit, three
  * consumers); cell assignment and centroid cosine are codegen'd
  * projections over centroid literals. The centroid cosine is DERIVED
  * from the assignment's own d2 struct (dot = (‖c‖² − d2)/2) with ‖c‖²
  * and ‖c‖ driver-computed constants embedded as the same binary64
  * literals on both engines, so no second bank of k dot products is
  * paid and the value is engine-neutral bit-for-bit; it lands on the q4
  * grid before ordering so ties (then broken by vec_id) are exact.
  *
  * 100 TB shape: the paper's own cost argument — clustering bounds the
  * quadratic stage to Σ(cell_size²) instead of corpus²; the pairs join
  * shuffles on cell id with NARROW rows (id, cell, ccos), vectors
  * re-attach by id only for surviving pairs (same discipline as
  * `llm_e2_embed_cosine_pairs`); the victim set re-joins corpus-keyed.
  * Production scales k with the corpus (k ≈ √N keeps cells bounded);
  * the contract pins the shared 16-cell fit.
  */
object SemDedup {

  /** Within-cluster duplicate threshold. The synthetic corpus has no
    * true semantic duplicates, so the contract pins a LOW threshold
    * (real SemDeDup runs at ≥0.95 on real embeddings) to keep both
    * verdicts populated at every SF; the keep-rule semantics are
    * additionally pinned on a planted-duplicate fixture in the spec. */
  private[llmops] val semTau = 0.30

  private def lits(xs: Array[Double]) = array(xs.map(lit): _*)

  /** (vec_id, cell, ccos) for every indexable embedding — assignment +
    * derived centroid cosine, one projection over the centroid literals. */
  private def assigned(s: SparkSession, dir: String): DataFrame = {
    val cs = ProductQuant.ivfCentroids(s, dir)
    val sumsq = cs.map(c => c.map(x => x * x).sum)
    val cnorm = sumsq.map(math.sqrt)
    LlmOps.normed(s, dir)
      .withColumn("m", array_min(array(LlmOps.ivfCellStructs(cs, col("v")): _*)))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("m").getField("cell").as("cell"),
        LlmOps.q4(
          ((element_at(lits(sumsq), col("m").getField("cell") + 1)
            - col("m").getField("d2")) / lit(2.0))
            / (col("nrm") * element_at(lits(cnorm), col("m").getField("cell") + 1)))
          .as("ccos"))
  }

  private def oracleSql(s: SparkSession, dir: String): String = {
    val cs = ProductQuant.ivfCentroids(s, dir)
    val structs = LlmOps.ivfCellStructsSql(cs)
    // string→double literals: DuckDB parses bare decimal literals as
    // DECIMAL, whose →DOUBLE conversion can double-round (the repo's
    // sqlDec2Dbl class); CAST('digits' AS DOUBLE) is correctly rounded,
    // so these lists hold the exact binary64 constants the plan carries
    def dlit(x: Double) = s"CAST('${java.lang.Double.toString(x)}' AS DOUBLE)"
    val sumsq = cs.map(c => dlit(c.map(x => x * x).sum)).mkString("[", ", ", "]")
    val cnorm = cs.map(c => dlit(math.sqrt(c.map(x => x * x).sum))).mkString("[", ", ", "]")
    s"""${LlmOps.sqlNormedCte},
      m AS (SELECT vec_id, v, nrm, list_min($structs) AS m FROM n),
      asgn AS (
        SELECT vec_id, v, nrm, m.cell AS cell,
               ${LlmOps.q4Sql(
                 s"(($sumsq[m.cell + 1] - m.d2) / 2.0)" +
                   s" / (nrm * $cnorm[m.cell + 1])")} AS ccos
        FROM m),
      cand AS (
        SELECT a.vec_id AS ia, a.ccos AS ca, b.vec_id AS ib, b.ccos AS cb
        FROM asgn a JOIN asgn b
          ON a.cell = b.cell AND a.vec_id < b.vec_id),
      -- vectors re-attach BY ID after the narrow pair join, mirroring
      -- the engine's shuffle-width discipline: on a key-corrupted
      -- corpus (vec_id reused with a different payload) both engines
      -- therefore fan each pair out over the id's payload variants —
      -- victim marking is ID-KEYED (an id drops if ANY of its variants
      -- is a near-dup of an earlier item); exact-copy duplicates
      -- collapse to identical rows (round-17 corruption gate)
      vict AS (
        SELECT DISTINCT CASE WHEN cd.ca <= cd.cb THEN cd.ib ELSE cd.ia END AS victim
        FROM cand cd
        JOIN asgn va ON va.vec_id = cd.ia
        JOIN asgn vb ON vb.vec_id = cd.ib
        WHERE ${LlmOps.q4Sql(LlmOps.sqlDotCols("va.v", "vb.v") + " / (va.nrm * vb.nrm)")}
              >= $semTau)
      SELECT a.vec_id, CAST(a.cell AS INT) AS cell, a.ccos,
             (v.victim IS NULL) AS kept
      FROM asgn a LEFT JOIN vict v ON a.vec_id = v.victim
      ORDER BY a.vec_id"""
  }

  private val semdedup = GraftQuery(
    "llm_e2_semdedup",
    "SemDeDup: k-means-cell-scoped cosine near-dup pruning, keep-outlier rule (E2)",
    None,
    (s, dir) => {
      val a = assigned(s, dir)
      // NARROW through the quadratic stage: (id, cell, ccos) only
      val narrow = a.select(col("vec_id"), col("cell"), col("ccos"))
      val cand = narrow.as("a")
        .join(narrow.as("b"),
          col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("a.ccos").as("ca"),
          col("b.vec_id").as("ib"), col("b.ccos").as("cb"))
      val vecs = a.select(col("vec_id"), col("v"), col("nrm"))
      val victims = cand
        .join(vecs.select(col("vec_id").as("ia"), col("v").as("qv"), col("nrm").as("qn")), "ia")
        .join(vecs.select(col("vec_id").as("ib"), col("v"), col("nrm")), "ib")
        .withColumn("paircos",
          LlmOps.q4(graft.functions.VectorFunctions.dot(col("qv"), col("v"))
            / (col("qn") * col("nrm"))))
        .filter(col("paircos") >= semTau)
        // the LATER item in (ccos, vec_id) order is the victim; ia < ib
        // always, so the ccos tie resolves to ib
        .select(when(col("ca") <= col("cb"), col("ib")).otherwise(col("ia")).as("victim"))
        .distinct()
      a.select(col("vec_id"), col("cell").cast("int").as("cell"), col("ccos"))
        .join(victims.withColumnRenamed("victim", "vec_id")
          .withColumn("hit", lit(true)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"), col("ccos"),
          col("hit").isNull.as("kept"))
        .orderBy(col("vec_id"))
    },
    oracleGen = Some(oracleSql))

  def queries: Seq[GraftQuery] = Seq(semdedup)
}
