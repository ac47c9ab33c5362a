package graft.llmops

import graft.GraftQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (extension family E3, third scale path after
  * hyperplane LSH and IVF): split the 64-d embedding into M=8 subspaces
  * of 8 dims, learn K=16 codewords per subspace (seeded k-means on a
  * bounded sample), and encode every corpus vector as 8 packed 4-bit
  * codes — ONE 32-bit int per vector. Search scans the compressed codes
  * with asymmetric distance (query subvector ↔ codeword table lookups),
  * never touching the raw vectors of non-candidates.
  *
  * Why this matters at 100 TB: a billion 64-d float vectors is 256 GB of
  * raw index; the PQ code column is 4 GB — it fits in the page cache of
  * a small cluster, and the ADC scan is a map-side projection over
  * (vec_id, code) with the codebooks shipped as plan literals. No
  * shuffle at all until the per-query top-k (keyed on q_id, bounded by
  * the query count × k).
  *
  * Rows-only contract (codeword geometry is seed-specific, not
  * SQL-expressible); ProductQuantSpec asserts determinism, the 4-bit
  * packing envelope, and recall against the exact cosine top-k.
  */
object ProductQuant {

  private val M = 8       // subspaces
  private val K = 16      // codewords per subspace → 4 bits per code
  private val subDim = 8  // embeddingDim / M
  // the subvector slicing below (copyOfRange, slice()) is only sound on
  // vectors of exactly the declared corpus dimension — which is what the
  // indexableEmbedding read-side contract now guarantees (T.embeddingDim)
  require(M * subDim == graft.T.embeddingDim,
    s"PQ geometry M*subDim=${M * subDim} must equal T.embeddingDim=${graft.T.embeddingDim}")

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    graft.T(s, dir, "embeddings")
      // non-indexable (null / non-finite) vectors dropped — same
      // read-side contract as LlmOps.embeddings(), mirrored in the
      // generated oracles' shared sqlNormedCte. Keeps the quantizer
      // training sample clean: a single NaN slot would poison every
      // Lloyd mean and leak bare `NaN` literals into the generated
      // LUT SQL (measured — DuckDB binder error, round-11 gate).
      .filter(graft.T.indexableEmbedding)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot(a, b)

  /** The bounded training sample shared by every quantizer fit in this
    * file (raw PQ codebooks, IVF centroids, residual PQ codebooks) —
    * ~16k vec_id-sorted points regardless of corpus size (quantizer
    * quality needs thousands of points, not the full 100 TB; the
    * sampled fraction shrinks as data grows). Memoized per (session,
    * dir) so the three fits pay ONE sample scan + collect, not three. */
  private def trainingSample(s: SparkSession, dir: String): Array[Array[Double]] =
    graft.SessionMemo.value(s, dir, "pq_training_sample") {
      val n = embeddings(s, dir)
      val total = n.count()
      val fraction = math.min(1.0, 16000.0 / total)
      n.sample(withReplacement = false, fraction, seed = 11L)
        .select(col("vec_id"), col("v")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Double](1).toArray)
    }

  /** Train M k-means codebooks on the shared bounded sample —
    * driver-side constants (M×K×subDim = 1024 doubles), fit with a
    * local Lloyd's loop: one Spark job total, versus 8 MLlib fits × 8
    * iterations of distributed jobs for the same 8 MB of data (the
    * MLlib formulation measured 8s of pure scheduling overhead at
    * sf0.1). Rows are vec_id-sorted before the fit so FP summation
    * order — and therefore the codebooks — are run-deterministic. */
  private[llmops] def trainCodebooks(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    fitCodebooks(trainingSample(s, dir))

  /** Fit codebooks from an arbitrary (already-local) point set —
    * package-visible so specs can train on planted corpora. */
  private[llmops] def fitCodebooks(sample: Array[Array[Double]]): Array[Array[Array[Double]]] =
    (0 until M).map { m =>
      lloyd(sample.map(v => java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim)))
    }.toArray

  /** Collect + vec_id-sort an arbitrary frame into a local point set
    * (spec fixtures are tiny by construction). */
  private[llmops] def localPoints(n: DataFrame): Array[Array[Double]] =
    n.select(col("vec_id"), col("v")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  /** Seeded Lloyd's iterations: deterministic evenly-spaced init over the
    * vec_id-sorted sample, 8 refinement passes, empty cells keep their
    * previous center. Parameterized over (k, dim) so the same fit serves
    * the 16×8-d PQ codebooks and the 16×64-d IVF coarse cells. */
  private def lloyd(xs: Array[Array[Double]], k: Int = K,
      dim: Int = subDim): Array[Array[Double]] = {
    val n = xs.length
    // empty training sample (an all-empty corpus — every 100 TB filter
    // chain eventually hands some stage zero rows): return the k
    // all-zero centers instead of indexing into nothing. Every
    // downstream probe/ADC join runs against an empty corpus side, so
    // the query result is empty regardless of the center values — the
    // codebook just has to EXIST for the plan to build.
    if (n == 0) return Array.fill(k, dim)(0.0)
    var centers = Array.tabulate(k)(c => xs(((c.toLong * n) / k).toInt).clone())
    for (_ <- 0 until 8) {
      val sums = Array.fill(k, dim)(0.0)
      val cnt = new Array[Long](k)
      xs.foreach { x =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = x(i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        cnt(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += x(i); i += 1 }
      }
      centers = Array.tabulate(k) { c =>
        if (cnt(c) > 0) sums(c).map(_ / cnt(c)) else centers(c)
      }
    }
    centers
  }

  /** argmin-codeword id for subspace m, as a codegen'd projection over
    * codeword literals (same shape as IVF's cellOf). */
  private def codeOf(cb: Array[Array[Double]], sub: Column): Column = {
    // the argmin is invariant to the +||sub||^2 constant, so it is
    // dropped: keeping it cost K redundant 8-dim self-dots per
    // subspace per corpus row in the encode (same -2ab + ||b||^2 form
    // as cellOf below)
    val cands = cb.zipWithIndex.map { case (cw, k) =>
      val cwLit = array(cw.map(lit): _*)
      struct(
        (lit(-2.0) * dot(sub, cwLit) + lit(cw.map(x => x * x).sum)).as("d2"),
        lit(k).as("k"))
    }
    array_min(array(cands: _*)).getField("k")
  }

  private val shortlist = 16

  /** The fixed query-vector set (vec_id < 10) — BOUNDED by construction
    * (the query set IS the search request), collected once and memoized
    * per (session, dir): the ADC LUT builders and the oracle generators
    * all read the same arrays. */
  private def queryVecs(s: SparkSession, dir: String): Array[(Long, Array[Double])] =
    graft.SessionMemo.value(s, dir, "pq_query_vecs") {
      embeddings(s, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    }

  /** UNION ALL of per-query `scored` branches — with a typed empty
    * branch when there are none: an empty corpus yields zero query
    * vectors, and zero branches would render `scored AS ()`, a DuckDB
    * PARSE error where the engine side returns an empty frame (the
    * empty-corpus gate compares empty-vs-empty instead). */
  private def scoredUnion(branches: Seq[String]): String =
    if (branches.isEmpty)
      "SELECT CAST(NULL AS BIGINT) AS q_id, CAST(NULL AS BIGINT) AS neighbor_id, " +
        "CAST(NULL AS DOUBLE) AS approx_d2 WHERE FALSE"
    else branches.mkString("\n        UNION ALL ")

  /** ||a − b||² over a subvector range, driver-side (LUT entries). */
  private def subD2(a: Array[Double], off: Int, b: Array[Double]): Double = {
    var d = 0.0; var i = 0
    while (i < b.length) { val t = a(off + i) - b(i); d += t * t; i += 1 }
    d
  }

  /** Generated-SQL spelling of the per-subspace argmin codeword id
    * (`c0`..`c7` columns): same struct-lexicographic argmin contract as
    * [[LlmOps.ivfCellStructsSql]] — DuckDB list_min over structs ==
    * Spark array_min over structs, dots fold sequentially, ||cw||²
    * constants embedded as identical binary64 literals. */
  private[llmops] def sqlCodeCols(cb: Array[Array[Array[Double]]], vcol: String = "v"): String =
    (0 until M).map { m =>
      val sub = s"$vcol[${m * subDim + 1}:${(m + 1) * subDim}]"
      val structs = cb(m).zipWithIndex.map { case (cw, k) =>
        val sumsq = java.lang.Double.toString(cw.map(x => x * x).sum)
        s"{'d2': -2.0 * ${LlmOps.sqlDot(sub, cw)} + $sumsq, 'k': $k}"
      }.mkString("[", ", ", "]")
      s"list_min($structs).k AS c$m"
    }.mkString(",\n        ")

  /** The flat-PQ pipeline as generated ANSI SQL: encode every corpus
    * vector into its 8 argmin codeword ids, scan with each query's ADC
    * LUT embedded as a 16-double list literal (one UNION branch per
    * query — the LUTs differ per query), rank into the shortlist, then
    * re-rank the shortlist by exact distance. The codebooks and LUTs
    * are the SAME driver-side doubles the Spark plan ships, so code
    * assignment, ADC sums, and both rankings are engine-neutral. */
  private def pqOracleSql(s: SparkSession, dir: String): String = {
    val cb = graft.SessionMemo.value(s, dir, "pq_codebooks") {
      trainCodebooks(s, dir)
    }
    val queryBranches = queryVecs(s, dir).map { case (qid, qv) =>
      val adc = (0 until M).map { m =>
        val lut = cb(m).map(cw => subD2(qv, m * subDim, cw))
          .map(java.lang.Double.toString).mkString("[", ", ", "]")
        s"list_extract($lut, c$m + 1)"
      }.mkString("(", "\n                 + ", ")")
      s"SELECT CAST($qid AS BIGINT) AS q_id, vec_id AS neighbor_id, ${LlmOps.q4Sql(adc)} AS approx_d2\n" +
        s"        FROM codes WHERE vec_id <> $qid"
    }
    val branches = scoredUnion(queryBranches)
    s"""${LlmOps.sqlNormedCte},
      codes AS (
        SELECT vec_id, ${sqlCodeCols(cb)}
        FROM e),
      scored AS (
        $branches),
      short AS (
        SELECT q_id, neighbor_id FROM (
          SELECT q_id, neighbor_id,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY approx_d2, neighbor_id) AS srn
          FROM scored)
        WHERE srn <= $shortlist),
      rerank AS (
        SELECT s.q_id, s.neighbor_id,
               ${LlmOps.q4Sql(sqlL2d2("q.v", "c.v"))} AS d2
        FROM short s
        JOIN e c ON s.neighbor_id = c.vec_id
        JOIN e q ON s.q_id = q.vec_id),
      ranked AS (
        SELECT q_id, neighbor_id, d2,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY d2, neighbor_id) AS INT) AS rn
        FROM rerank)
      SELECT q_id, rn, neighbor_id, d2
      FROM ranked WHERE rn <= 3
      ORDER BY q_id, rn"""
  }

  /** Sequential-fold squared L2 distance between two vector columns —
    * the distance twin of [[LlmOps.sqlDotCols]] (same fold order as the
    * Spark zip_with/aggregate spelling; the 0.0 init only ever adds to
    * a non-negative square, so the missing-init list_reduce fold is
    * bit-identical). */
  private def sqlL2d2(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2])), (a, b) -> a + b)"

  /** The compressed index: (vec_id, packed code) + the codebooks that
    * produced it. Code packing: Σ_m code_m << 4m — one BIGINT holding
    * 8×4 bits (the top 4 bits would overflow a signed INT). Shared by
    * the ANN search and the code-level semantic dedup — and memoized
    * per (session, dir) so the two consumers pay ONE codebook fit +
    * corpus encode per run: the codebooks live in the driver-side
    * value memo, the encoded frame is persisted via the frame memo,
    * and both are released together by [[graft.SessionMemo.clear]]. */
  private[llmops] def codeIndex(s: SparkSession, dir: String): (DataFrame, Array[Array[Array[Double]]]) = {
    val cb = graft.SessionMemo.value(s, dir, "pq_codebooks") {
      trainCodebooks(s, dir)
    }
    val codes = graft.SessionMemo.materialized(s, dir, "pq_codes") {
      encodeWith(embeddings(s, dir), cb)
    }
    (codes, cb)
  }

  /** Encode any (vec_id, v) frame against the given codebooks. */
  private[llmops] def encodeWith(n: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame = {
    val packed = (0 until M).map { m =>
      shiftleft(codeOf(cb(m), slice(col("v"), m * subDim + 1, subDim)).cast("long"), 4 * m)
    }.reduce(_ + _)
    n.withColumn("code", packed).select(col("vec_id"), col("code"))
  }

  /** PQ ANN top-3 for the fixed query set (vec_id < 10, matching the
    * other E3 queries): encode corpus → packed code, precompute each
    * query's ADC lookup table (LUT[m][k] = ||q_sub_m − codeword k||²),
    * rank the compressed scan into a per-query shortlist, then re-rank
    * the shortlist by EXACT distance (the standard PQ + re-rank
    * pipeline: the compressed scan touches every code, the raw vectors
    * are fetched for shortlist×queries rows only).
    *
    * The query vectors are collected to the driver to build the LUTs —
    * a BOUNDED read by construction (the query set IS the search
    * request, 10 rows here), exactly mirroring how a PQ index serves
    * queries in practice. The scan itself is then pure codegen: per
    * code, Σ_m element_at(LUT literal, 4-bit field) — no array HOFs,
    * no corpus vectors, no join. ORACLE-PAIRED since round 9 via
    * generated SQL embedding the codebooks and per-query LUTs as
    * literals ([[pqOracleSql]]); the ADC and exact distances both go
    * through the tie-free q4 quantization so rankings cannot flip
    * cross-engine. */
  private val pqTopK = GraftQuery(
    "llm_e3_pq_topk",
    "product-quantization ADC shortlist + exact re-rank ANN top-3 (E3)",
    None,
    (s, dir) => {
      val n = embeddings(s, dir)
      val (codes, cb) = codeIndex(s, dir)
      val queries = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val qvs = queryVecs(s, dir)
      if (qvs.isEmpty) {
        // empty corpus → empty query set → the search result is empty
        // by definition. Emit the declared shape explicitly: the
        // LUT-literal plan below spells the query fan-out as
        // explode(array(<one struct per query>)), and a ZERO-column
        // array types as VOID, which no downstream field extraction
        // can bind against.
        import org.apache.spark.sql.types._
        s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          StructType(Seq(StructField("q_id", LongType), StructField("rn", IntegerType),
            StructField("neighbor_id", LongType), StructField("d2", DoubleType))))
      } else {
      // per-query ADC distance as LUT-literal lookups over the packed code
      val perQuery = qvs.map { case (qid, qv) =>
        val adc = (0 until M).map { m =>
          val lut = cb(m).map(cw => subD2(qv, m * subDim, cw))
          element_at(array(lut.map(lit): _*),
            shiftright(col("code"), 4 * m).bitwiseAND(lit(15L)).cast("int") + 1)
        }.reduce(_ + _)
        struct(lit(qid).as("q_id"), adc.as("adc"))
      }
      // k-bounded shortlist via TopKAgg, NOT a window: row_number over
      // PARTITION BY q_id would shuffle every (query × corpus) scored
      // row to one of only |queries| reducers and sort there; the
      // aggregate folds to ≤ shortlist rows per query map-side. Scores
      // are q4-quantized BEFORE ranking, so the (-d2, id) total order
      // is identical to the oracle's row_number tie-break.
      val topk = graft.functions.TopKAgg.udaf(shortlist)
      val short = codes
        .select(col("vec_id"), explode(array(perQuery: _*)).as("s"))
        .select(col("s.q_id").as("q_id"), col("vec_id").as("neighbor_id"),
          LlmOps.q4(col("s.adc")).as("approx_d2"))
        .filter(col("neighbor_id") =!= col("q_id"))
        .groupBy(col("q_id"))
        .agg(topk(-col("approx_d2"), col("neighbor_id")).as("top"))
        .select(col("q_id"), explode(col("top")).as("item"))
        .select(col("q_id"), col("item.id").as("neighbor_id"))
      // exact re-rank: raw vectors re-attach for shortlist rows only
      val exactD2 = aggregate(
        zip_with(col("qv"), col("v"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val wExact = Window.partitionBy(col("q_id"))
        .orderBy(col("d2"), col("neighbor_id"))
      short
        .join(n.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
        .join(broadcast(queries), "q_id")
        .withColumn("d2", LlmOps.q4(exactD2))
        .withColumn("rn", row_number().over(wExact))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("neighbor_id"), col("d2"))
        .orderBy("q_id", "rn")
      }
    },
    oracleGen = Some(pqOracleSql))

  /** Banded semantic near-dup pairs over a compressed index: candidate
    * pairs agree on a 16-bit HALF of the packed code (two bands of 4
    * subquantizers, MinHash-style banding), then exact cosine >= `tau`
    * verifies each candidate. Candidate generation shuffles only
    * (vec_id, band key) — derived from the compressed column, 4 GB per
    * billion vectors — and raw vectors re-attach for candidate pairs
    * only. Package-private so ProductQuantSpec can drive it with a
    * planted-duplicate corpus. */
  private[llmops] def semanticDupPairs(
      n: DataFrame, codes: DataFrame, tau: Double): DataFrame = {
    val banded = codes.select(col("vec_id"),
      explode(array(
        struct(lit(0).as("band"), col("code").bitwiseAND(lit(65535L)).as("key")),
        struct(lit(1).as("band"), shiftright(col("code"), 16).as("key")))).as("b"))
      .select(col("vec_id"), col("b.band").as("band"), col("b.key").as("key"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("keep_id"), col("b.vec_id").as("prune_id"))
      .distinct()
    val nrm = sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v")))
    val normed = n.withColumn("nrm", nrm)
    val cosine = graft.functions.VectorFunctions.dot(col("kv"), col("v")) /
      (col("kn") * col("nrm"))
    cand
      .join(normed.select(col("vec_id").as("keep_id"), col("v").as("kv"),
        col("nrm").as("kn")), "keep_id")
      .join(normed.select(col("vec_id").as("prune_id"), col("v"), col("nrm")),
        "prune_id")
      .withColumn("cosine", LlmOps.q4(cosine))
      .filter(col("cosine") >= tau)
      .select(col("keep_id"), col("prune_id"), col("cosine"))
  }

  /** PQ-index semantic-dedup AUDIT: per band, how loaded are the 16-bit
    * cells (occupied cells, worst cell, candidate pairs) and how many
    * candidates verify as true near-dups at cosine >= 0.4 — the health
    * check a pipeline runs to decide whether its compressed index can
    * double as a dedup hash. On this corpus the verified count is
    * honestly ZERO (max pairwise cosine ~0.46 — no semantic duplicates
    * exist to find); the pair-finding core is proven on planted
    * duplicates in ProductQuantSpec. Always two rows (one per band) —
    * never vacuously empty.
    *
    * ORACLE-PAIRED since round 9: the band keys are pure arithmetic
    * over the argmin codeword ids (band 0 = low 16 bits = subspaces
    * 0–3, band 1 = high 16 = subspaces 4–7), so the generated SQL
    * re-derives them as c0 + 16·c1 + 256·c2 + 4096·c3 over the same
    * codes CTE the PQ oracle uses ([[pqAuditOracleSql]]). */
  private val pqCodeDedup = GraftQuery(
    "llm_e2_pq_dedup_audit",
    "PQ half-code band occupancy + verified near-dup count audit (E2)",
    None,
    (s, dir) => {
      val n = embeddings(s, dir)
      val (codes, _) = codeIndex(s, dir)
      val banded = codes.select(col("vec_id"),
        explode(array(
          struct(lit(0).as("band"), col("code").bitwiseAND(lit(65535L)).as("key")),
          struct(lit(1).as("band"), shiftright(col("code"), 16).as("key")))).as("b"))
        .select(col("b.band").as("band"), col("b.key").as("key"))
      val cellStats = banded.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("band"))
        .agg(
          count(lit(1)).as("n_cells"),
          max(col("m")).as("max_cell"),
          sum(col("m") * (col("m") - 1) / 2).cast("long").as("n_cand_pairs"))
      // the verified-dup count joins in as a lazy 1-row broadcast (NOT an
      // eager .count() at plan-construction time — building a GraftQuery
      // must stay job-free, like every other query in the registry)
      val nDup = semanticDupPairs(n, codes, 0.4)
        .agg(count(lit(1)).cast("long").as("n_dup_pairs"))
      cellStats
        .crossJoin(broadcast(nDup))
        .select(col("band"), col("n_cells"), col("max_cell"),
          col("n_cand_pairs"), col("n_dup_pairs"))
        .orderBy("band")
    },
    oracleGen = Some(pqAuditOracleSql))

  /** The dedup-audit pipeline as generated ANSI SQL — band keys, cell
    * stats, and the cosine-verified dup count over the same codes CTE
    * as [[pqOracleSql]]. The m·(m−1)/2 pair count divides a BIGINT by
    * 2 — float division in both engines (Spark integral `/` and DuckDB
    * `/` both promote to double), exact for these magnitudes, then cast
    * back to BIGINT. */
  private def pqAuditOracleSql(s: SparkSession, dir: String): String = {
    val cb = graft.SessionMemo.value(s, dir, "pq_codebooks") {
      trainCodebooks(s, dir)
    }
    val cosine = LlmOps.q4Sql(
      LlmOps.sqlDotCols("na.v", "nb.v") + " / (na.nrm * nb.nrm)")
    s"""${LlmOps.sqlNormedCte},
      codes AS (
        SELECT vec_id, ${sqlCodeCols(cb)}
        FROM e),
      banded AS (
        SELECT vec_id, 0 AS band,
               CAST(c0 + 16 * c1 + 256 * c2 + 4096 * c3 AS BIGINT) AS key
        FROM codes
        UNION ALL
        SELECT vec_id, 1,
               CAST(c4 + 16 * c5 + 256 * c6 + 4096 * c7 AS BIGINT)
        FROM codes),
      cells AS (
        SELECT band, key, count(*) AS m FROM banded GROUP BY band, key),
      cellstats AS (
        SELECT band, count(*) AS n_cells, max(m) AS max_cell,
               CAST(sum(m * (m - 1) / 2) AS BIGINT) AS n_cand_pairs
        FROM cells GROUP BY band),
      cand AS (
        SELECT DISTINCT a.vec_id AS keep_id, b.vec_id AS prune_id
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
      dup AS (
        SELECT count(*) AS n_dup_pairs FROM (
          SELECT $cosine AS cosine
          FROM cand c
          JOIN n na ON c.keep_id = na.vec_id
          JOIN n nb ON c.prune_id = nb.vec_id)
        WHERE cosine >= 0.4)
      SELECT band, n_cells, max_cell, n_cand_pairs,
             (SELECT n_dup_pairs FROM dup) AS n_dup_pairs
      FROM cellstats
      ORDER BY band"""
  }

  private val ivfCells = 16
  private[llmops] val ivfProbes = 4

  /** IVF coarse quantizer trained on the same bounded sample discipline
    * as the PQ codebooks (16 full-dimension cells, seeded local Lloyd),
    * memoized per (session, dir) beside them. Package-visible: the flat
    * IVF search in [[LlmOps]] shares this quantizer (one fit serves both
    * IVF and IVF-PQ) and its oracle generator embeds the same centroids
    * as SQL literals. */
  private[llmops] def ivfCentroids(s: SparkSession, dir: String): Array[Array[Double]] =
    graft.SessionMemo.value(s, dir, "ivfpq_centroids") {
      lloyd(trainingSample(s, dir), k = ivfCells, dim = M * subDim)
    }

  /** nearest-cell id as a codegen'd projection over centroid literals —
    * the 64-d analog of [[codeOf]]. */
  private def cellOf(cs: Array[Array[Double]], v: Column): Column = {
    val cands = cs.zipWithIndex.map { case (c, i) =>
      val cc = array(c.map(lit): _*)
      struct(
        (lit(-2.0) * dot(v, cc) + lit(c.map(x => x * x).sum)).as("d2"),
        lit(i).as("cell"))
    }
    array_min(array(cands: _*)).getField("cell")
  }

  /** RESIDUAL PQ codebooks for the IVF-PQ composition — the standard
    * accuracy win at the same bit budget: after coarse assignment, the
    * vector's residual (v − centroid(cell)) is what the PQ codes must
    * represent, and residuals are concentrated near the origin where a
    * 16-codeword subquantizer spends its codewords far better than on
    * the raw spread-out vectors. ONE codebook set shared across cells,
    * trained on the same bounded vec_id-sorted sample (assigned to
    * cells and residualized driver-side — the sample is local). */
  private def residualCodebooks(s: SparkSession, dir: String,
      cs: Array[Array[Double]]): Array[Array[Array[Double]]] =
    graft.SessionMemo.value(s, dir, "ivfpq_res_codebooks") {
      val sample = trainingSample(s, dir)
      val residuals = sample.map { v =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        Array.tabulate(v.length)(i => v(i) - cs(best)(i))
      }
      (0 until M).map { m =>
        lloyd(residuals.map(v => java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim)))
      }.toArray
    }

  /** The combined IVF-PQ index: (vec_id, cell, packed RESIDUAL PQ code)
    * — one INT + one BIGINT per vector. The residual is computed in the
    * same projection as the cell id (element_at over the centroid
    * literals selects the assigned centroid, zip_with subtracts), so
    * the encode is still one codegen'd map-side pass with no join and
    * no shuffle. Memoized per (session, dir). Direct-coding note: the
    * flat [[pqTopK]] scan and the dedup audit keep their own shared
    * raw-vector code frame ([[codeIndex]]); the residual index is a
    * separate frame because its codes live in residual space. */
  private[llmops] def ivfPqIndex(s: SparkSession, dir: String)
      : (DataFrame, Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cs = ivfCentroids(s, dir)
    val cb = residualCodebooks(s, dir, cs)
    val indexed = graft.SessionMemo.materialized(s, dir, "ivfpq_index") {
      val centroidLits = array(cs.map(c => array(c.map(lit): _*)): _*)
      val withCell = embeddings(s, dir)
        .withColumn("cell", cellOf(cs, col("v")))
        .withColumn("r",
          zip_with(col("v"), element_at(centroidLits, col("cell") + 1),
            (a, b) => a - b))
      val packed = (0 until M).map { m =>
        shiftleft(codeOf(cb(m), slice(col("r"), m * subDim + 1, subDim)).cast("long"), 4 * m)
      }.reduce(_ + _)
      withCell.select(col("vec_id"), col("cell"), packed.as("code"))
    }
    (indexed, cs, cb)
  }

  /** IVF-PQ ANN top-3 — the billion-scale composition: the IVF cell
    * filter prunes the corpus to each query's `ivfProbes` nearest cells
    * (~probes/cells of the data), and the PQ ADC scan then reads ONLY
    * those cells' compressed codes; exact re-rank on the shortlist as
    * in [[pqTopK]], with RESIDUAL codes ([[residualCodebooks]]) and
    * per-(query, probe-cell) ADC LUTs. Probe-cell selection and the
    * LUTs are pure driver arithmetic over the memoized centroids and
    * query vectors (no job); each (query, cell) struct rides into the
    * plan inside a filter() higher-order function keyed on its cell id,
    * so non-probed rows generate ZERO exploded candidates — the fan-out
    * is (probed fraction) × queries, not queries × corpus.
    *
    * At 100 TB: a billion-vector index is 4 GB of codes + 12 B of cell
    * ids per vector; a query touches probes/cells ≈ 25% of it here, and
    * production tunes cells up (√N cells → ~0.4% scanned at 1e9 rows)
    * with the identical plan shape. ORACLE-PAIRED since round 9: cell
    * assignment, residual encode, and the per-(query, probe) ADC scan
    * are all argmin/arithmetic over deterministic driver-side constants,
    * so the generated SQL ([[ivfPqOracleSql]]) re-derives the whole
    * pipeline with the same literals. ProductQuantSpec keeps the
    * independent recall and scan-pruning assertions. */
  private def nearestCells(cs: Array[Array[Double]], qv: Array[Double]): Seq[Int] =
    cs.zipWithIndex.map { case (c, i) => (subD2(qv, 0, c), i) }
      .sortBy(_._1).take(ivfProbes).map(_._2).toSeq

  private val ivfPqTopK = GraftQuery(
    "llm_e3_ivfpq_topk",
    "IVF cell pruning + PQ ADC compressed scan + exact re-rank ANN top-3 (E3)",
    None,
    (s, dir) => {
      val n = embeddings(s, dir)
      val (indexed, cs, cb) = ivfPqIndex(s, dir)
      val queries = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      // residual coding makes the ADC LUT per-(query, probe cell): the
      // query's residual against EACH probed centroid gets its own
      // 8×16 table (FAISS's IVFPQ search shape). 10 queries × 4 probes
      // of driver arithmetic, shipped as a 40-row BROADCAST probe table
      // whose LUTs ride as array columns. The cell-id equi-join IS the
      // probe match, and — unlike the earlier filter()-HOF spelling,
      // whose interpreted lambda eagerly evaluated all 40 ADC structs
      // per corpus row before discarding the non-matches (measured 2.1s
      // warm) — the ADC sum here is computed only for the ~probes/cells
      // fraction of (row, query) pairs that survive the join, entirely
      // inside whole-stage codegen (element_at over the joined array
      // columns).
      import s.implicits._
      val probes = queryVecs(s, dir).flatMap { case (qid, qv) =>
        nearestCells(cs, qv).map { cell =>
          val rq = Array.tabulate(qv.length)(i => qv(i) - cs(cell)(i))
          val luts = (0 until M).map(m => cb(m).map(cw => subD2(rq, m * subDim, cw)))
          (qid, cell, luts(0), luts(1), luts(2), luts(3),
            luts(4), luts(5), luts(6), luts(7))
        }
      }.toSeq.toDF("q_id", "pcell", "lut0", "lut1", "lut2", "lut3",
        "lut4", "lut5", "lut6", "lut7")
      val adc = (0 until M).map { m =>
        element_at(col(s"lut$m"),
          shiftright(col("code"), 4 * m).bitwiseAND(lit(15L)).cast("int") + 1)
      }.reduce(_ + _)
      // k-bounded shortlist via TopKAgg (same rationale + tie-break
      // equivalence as in [[pqTopK]])
      val topk = graft.functions.TopKAgg.udaf(shortlist)
      val short = indexed
        .join(broadcast(probes), col("cell") === col("pcell"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          LlmOps.q4(adc).as("approx_d2"))
        .filter(col("neighbor_id") =!= col("q_id"))
        .groupBy(col("q_id"))
        .agg(topk(-col("approx_d2"), col("neighbor_id")).as("top"))
        .select(col("q_id"), explode(col("top")).as("item"))
        .select(col("q_id"), col("item.id").as("neighbor_id"))
      val exactD2 = aggregate(
        zip_with(col("qv"), col("v"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val wExact = Window.partitionBy(col("q_id"))
        .orderBy(col("d2"), col("neighbor_id"))
      short
        .join(n.select(col("vec_id").as("neighbor_id"), col("v")), "neighbor_id")
        .join(broadcast(queries), "q_id")
        .withColumn("d2", LlmOps.q4(exactD2))
        .withColumn("rn", row_number().over(wExact))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("neighbor_id"), col("d2"))
        .orderBy("q_id", "rn")
    },
    oracleGen = Some(ivfPqOracleSql))

  /** The IVF-PQ pipeline as generated ANSI SQL — the composition of
    * [[LlmOps.ivfCellStructsSql]] (coarse cell), a residual projection
    * against the selected centroid literal, [[sqlCodeCols]] over the
    * residual, and one ADC UNION branch per (query, probe cell) with
    * its own LUT literal — filtered to that cell's rows, exactly like
    * the Spark HOF-filter fan-out. */
  private def ivfPqOracleSql(s: SparkSession, dir: String): String = {
    val cs = ivfCentroids(s, dir)
    val cb = residualCodebooks(s, dir, cs)
    val centroidList = cs.map(_.map(java.lang.Double.toString)
      .mkString("[", ", ", "]")).mkString("[", ",\n          ", "]")
    val branches = scoredUnion(queryVecs(s, dir).flatMap { case (qid, qv) =>
      nearestCells(cs, qv).map { cell =>
        val rq = Array.tabulate(qv.length)(i => qv(i) - cs(cell)(i))
        val adc = (0 until M).map { m =>
          val lut = cb(m).map(cw => subD2(rq, m * subDim, cw))
            .map(java.lang.Double.toString).mkString("[", ", ", "]")
          s"list_extract($lut, c$m + 1)"
        }.mkString("(", "\n                 + ", ")")
        s"SELECT CAST($qid AS BIGINT) AS q_id, vec_id AS neighbor_id, " +
          s"${LlmOps.q4Sql(adc)} AS approx_d2\n" +
          s"        FROM rcodes WHERE cell = $cell AND vec_id <> $qid"
      }
    })
    s"""${LlmOps.sqlNormedCte},
      asgn AS (
        SELECT vec_id, v,
               list_min(${LlmOps.ivfCellStructsSql(cs)}).cell AS cell
        FROM e),
      res AS (
        SELECT vec_id, cell,
               list_transform(
                 list_zip(v, list_extract($centroidList, cell + 1)),
                 p -> p[1] - p[2]) AS r
        FROM asgn),
      rcodes AS (
        SELECT vec_id, cell, ${sqlCodeCols(cb, "r")}
        FROM res),
      scored AS (
        $branches),
      short AS (
        SELECT q_id, neighbor_id FROM (
          SELECT q_id, neighbor_id,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY approx_d2, neighbor_id) AS srn
          FROM scored)
        WHERE srn <= $shortlist),
      rerank AS (
        SELECT s.q_id, s.neighbor_id,
               ${LlmOps.q4Sql(sqlL2d2("q.v", "c.v"))} AS d2
        FROM short s
        JOIN e c ON s.neighbor_id = c.vec_id
        JOIN e q ON s.q_id = q.vec_id),
      ranked AS (
        SELECT q_id, neighbor_id, d2,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY d2, neighbor_id) AS INT) AS rn
        FROM rerank)
      SELECT q_id, rn, neighbor_id, d2
      FROM ranked WHERE rn <= 3
      ORDER BY q_id, rn"""
  }

  def queries: Seq[GraftQuery] = Seq(pqTopK, pqCodeDedup, ivfPqTopK)
}
