package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators (SURVEY.md §2.11 E1-E4 + the
  * driver's north-star extensions): deduplication (exact, n-gram Jaccard,
  * MinHash LSH, SimHash), similarity search (exact cosine top-k and
  * LSH-bucketed ANN), and text analysis (term frequencies, quality
  * scoring, language ID, fingerprinting) over the `documents` and
  * `embeddings` testdata tables.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - NOTHING here does an all-pairs crossJoin over documents. Candidate
  *    generation is always an inverted-index shuffle join (shared shingle /
  *    shared LSH band / shared SimHash chunk), which is the standard
  *    linear-ish-in-corpus path; the quadratic blowup is confined to
  *    within-bucket pairs.
  *  - Exact-dedup is one hash-shuffle (map-side partial agg first).
  *  - Similarity SEARCH broadcasts the (fixed, small) query set, never the
  *    corpus: a BroadcastNestedLoopJoin that scans the corpus once.
  *  - Frequent-shingle skew: both the MinHash path and the exact-Jaccard
  *    query drop stop-shingles via a document-frequency cap
  *    (shinglesCapped) the same way production near-dup pipelines do; the
  *    oracle SQL applies the identical cap so semantics stay aligned.
  */
object LlmOps {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")
  /** Vector-op view of the embeddings table: non-INDEXABLE vectors
    * (null, carrying a NaN/±Inf slot, or off the declared
    * [[graft.T.embeddingDim]] — dimension drift from mixed model
    * versions) are dropped at the read — see
    * [[graft.T.indexableEmbedding]] for the contract; every paired
    * oracle mirrors with `WHERE ${T.sqlIndexable}`. */
  private def embeddings(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings").filter(T.indexableEmbedding)

  /** Whitespace tokens. The corpus is whitespace-delimited words (see
    * TESTDATA.md); a BPE-ish regex tokenizer is exercised in e4_quality. */
  private def toks(text: Column): Column = split(text, " ", -1)

  /** Distinct n-token shingles of the token array `t` (docs shorter than
    * n tokens are filtered out by callers). Package-visible for the
    * streaming decontamination twin. */
  private[graft] def ngramExpr(n: Int): String = {
    val parts = (0 until n).map(j => s"t[i+$j]").mkString(", ")
    s"array_distinct(transform(sequence(0, size(t) - $n), i -> concat_ws(' ', $parts)))"
  }

  /** (doc_id, s): one row per distinct n-gram of a documents frame.
    * Shared by the batch decontamination query and its streaming twin. */
  private[graft] def docNgrams(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(expr(ngramExpr(n))).as("s"))

  /** Distinct 3-token shingles of `t` (docs shorter than 3 tokens are
    * filtered out by callers). */
  private val shingleExpr = ngramExpr(3)

  /** doc_id, s (one row per distinct shingle). The inverted-index input.
    * Package-visible so LlmOpsSpec can probe the skew behavior directly.
    *
    * The `.distinct()` is load-bearing, not defensive: every consumer's
    * math is SET math — df = |docs containing s|, shared = |A∩B|,
    * Jaccard ≤ 1 — and a duplicate-KEY corpus (the same doc row committed
    * twice, tenth axis, round 15) otherwise double-counts every
    * (doc_id, s) pair, yielding Jaccard = 2.0 "similarities" (measured
    * before the fix). Cost at scale: the distinct's partial hash
    * aggregate dedupes map-side, so on a clean corpus the exchange
    * carries the same distinct pairs the df-count shuffle already moved;
    * one extra exchange of the index buys unconditionally well-formed
    * set semantics. MinHash is unaffected either way (min-agg is
    * duplicate-immune). */
  private[graft] def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(docs(s, dir))

  /** [[shingles]] over an arbitrary documents frame — shared with the
    * incremental (delta-vs-base) dedup path, whose base and delta splits
    * each need their own shingle sets. */
  private def shinglesOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(shingleExpr)).as("s"))
      .distinct()

  /** Shingles with a document-frequency cap: shingles appearing in more
    * than `maxDf` docs are dropped from candidate generation (a shingle
    * shared by half the corpus generates df² candidate pairs and carries
    * no near-dup signal — the skew escape hatch production near-dup
    * pipelines use). Semi-join keeps the shuffle narrow (shingle, df)
    * and lets the MinHash agg stay map-side partial. */
  private[graft] def shinglesCapped(s: SparkSession, dir: String, maxDf: Int): DataFrame = {
    val sh = shingles(s, dir)
    val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("s"))
    sh.join(rare, "s", "left_semi")
  }

  // ---------------------------------------------------------------------
  // E1: exact dedup
  // ---------------------------------------------------------------------

  /** Exact dedup via content hash: one row per distinct text, canonical =
    * min(doc_id), plus copy count. sha2 is computed map-side; the only
    * shuffle is the partial+final agg on the 256-bit key — at 100 TB this
    * is the cheapest possible dedup (no text comparison after hashing). */
  private val e1 = GraftQuery(
    "llm_e1_exact_dedup",
    "sha256 content hash -> canonical doc per cluster (E1)",
    Some("""
      SELECT sha256(text) AS content_hash,
             min(doc_id) AS canonical_id,
             count(*) AS n_copies
      FROM documents
      GROUP BY sha256(text)
      ORDER BY content_hash"""),
    (s, dir) =>
      docs(s, dir)
        .groupBy(sha2(col("text"), 256).as("content_hash"))
        .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_hash"))

  /** Dedup summary: corpus size before/after exact dedup. */
  private val e1Stats = GraftQuery(
    "llm_e1_dedup_stats",
    "dedup cardinality summary (E1)",
    Some("""
      SELECT count(*) AS n_total,
             count(DISTINCT text) AS n_unique,
             count(*) - count(DISTINCT text) AS n_duplicates
      FROM documents"""),
    (s, dir) =>
      docs(s, dir).agg(
        count(lit(1)).as("n_total"),
        countDistinct(col("text")).as("n_unique"),
        (count(lit(1)) - countDistinct(col("text"))).as("n_duplicates")))

  // incoming-batch membership rule for incremental dedup: doc_id % 10 == 7
  // models the daily ingest slice; production passes the real batch table.
  private[llmops] val incomingMod = 10
  private[llmops] val incomingRem = 7

  /** Incremental ingest dedup (E1's daily-batch shape): classify each doc
    * of an incoming batch against the existing corpus — `dup_of_corpus`
    * (content hash already in the corpus), `dup_in_batch` (first
    * occurrence inside the batch wins, later copies flagged), or `novel`.
    *
    * 100 TB posture: the corpus is NEVER shuffled. Its scan is semi-joined
    * against the BROADCAST set of incoming hashes (the batch is small by
    * construction), producing the tiny matched-hash set, which is
    * broadcast back onto the batch; the only shuffle is the batch-sized
    * window that ranks within-batch copies. Compare: a naive
    * `incoming JOIN corpus ON hash` shuffles 100 TB of hashes every day. */
  private val e1Incremental = GraftQuery(
    "llm_e1_incremental_dedup",
    "incoming batch vs corpus: dup_of_corpus / dup_in_batch / novel (E1)",
    Some(s"""
      WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
      inc AS (SELECT doc_id, h FROM d WHERE doc_id % $incomingMod = $incomingRem),
      cor AS (SELECT DISTINCT h FROM d WHERE doc_id % $incomingMod <> $incomingRem),
      j AS (
        SELECT i.doc_id, (c.h IS NOT NULL) AS in_corpus,
               row_number() OVER (PARTITION BY i.h ORDER BY i.doc_id) AS rn
        FROM inc i LEFT JOIN cor c ON i.h = c.h)
      SELECT doc_id,
        CASE WHEN in_corpus THEN 'dup_of_corpus'
             WHEN rn > 1 THEN 'dup_in_batch'
             ELSE 'novel' END AS status
      FROM j ORDER BY doc_id"""),
    (s, dir) => {
      val hashed = docs(s, dir)
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      val inc = hashed.filter(col("doc_id") % incomingMod === incomingRem)
      val cor = hashed.filter(col("doc_id") % incomingMod =!= incomingRem)
      // corpus-side scan, broadcast semi-join, then DISTINCT over the
      // (batch-bounded) matches: the corpus contributes only hashes that
      // the batch also has, and only once each
      val matched = cor
        .join(broadcast(inc.select(col("h")).distinct()), Seq("h"), "left_semi")
        .select(col("h")).distinct()
        .withColumn("in_corpus", lit(true))
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      inc
        .join(broadcast(matched), Seq("h"), "left")
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"),
          when(col("in_corpus"), "dup_of_corpus")
            .when(col("rn") > 1, "dup_in_batch")
            .otherwise("novel").as("status"))
        .orderBy("doc_id")
    })

  // ---------------------------------------------------------------------
  // E2: near-duplicate detection
  // ---------------------------------------------------------------------

  // df-cap applied IDENTICALLY in the Spark plan and the oracle SQL:
  // semantics stay aligned while stop-shingle skew (the df² fan-out
  // killer at corpus scale) is bounded. No shingle reaches the cap at
  // test SFs, so results equal the uncapped formulation there.
  private val jaccardMaxDf = 1000

  /** EXACT n-gram Jaccard near-dup pairs via inverted-index self-join:
    * explode distinct 3-shingles, drop stop-shingles past the df-cap
    * (both engines), join docs sharing a surviving shingle, count shared
    * shingles, Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over capped shingle
    * sets. The join fans out per-shingle, not per-doc-pair: cost is sum
    * over shingles of min(df, cap)², the inverted-index bound made
    * skew-safe. */
  private val e2Jaccard = GraftQuery(
    "llm_e2_ngram_jaccard_pairs",
    "exact 3-gram Jaccard >= 0.5 pairs, inverted-index join (E2)",
    Some(s"""
      WITH toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toksrc),
      sh0 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      rare AS (
        SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $jaccardMaxDf),
      sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
      n AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT p.da, p.db, p.shared,
             p.shared / (na.nsh + nb.nsh - p.shared) AS jaccard
      FROM pairs p
      JOIN n na ON p.da = na.doc_id
      JOIN n nb ON p.db = nb.doc_id
      WHERE p.shared / (na.nsh + nb.nsh - p.shared) >= 0.5
      ORDER BY da, db"""),
    (s, dir) => jaccardPairs(s, dir).orderBy("da", "db"))

  /** Shared-frame memoization — see [[graft.SessionMemo]] for the
    * ownership/concurrency contract. LlmOps pins: the exact-Jaccard pair
    * set (jaccard + dedup-cluster queries), the df-capped shingle index
    * (Jaccard + MinHash), the MinHash candidates, the CC cluster frame,
    * and the repeated-span index (span index + cut queries). Sites whose
    * build is a plain persist+count use [[graft.SessionMemo.materialized]];
    * the rest (custom release logic) call
    * [[graft.SessionMemo.memoized]]. */
  private def memoized(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    graft.SessionMemo.memoized(s, dir, key)(build)

  /** Unsorted exact-Jaccard pairs (da, db, shared, jaccard) — the
    * verify-facing query adds the deterministic sort; graph consumers
    * (dedup clusters) share the same materialized frame via the memo.
    * The shingle index feeds three plan branches (both self-join sides +
    * per-doc counts); persist materializes it once — at cluster scale
    * this is the standard cached/checkpointed inverted index. */
  private def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "jaccard_pairs") { buildJaccardPairs(s, dir) }

  /** The df-capped shingle index, materialized once per (session, dir) and
    * shared by the exact-Jaccard self-join AND the MinHash signature build
    * (the index explode + df agg + semi-join dominates both). Owned by the
    * memo; released by [[graft.SessionMemo.clear]]. */
  private def cappedShingleIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, s"shingles_capped_$jaccardMaxDf") {
      shinglesCapped(s, dir, jaccardMaxDf)
    }

  private def buildJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val sh = cappedShingleIndex(s, dir)
    val n = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
    val pairs = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("shared"))
    val out = pairs
      .join(n.as("na"), col("da") === col("na.doc_id"))
      .join(n.as("nb"), col("db") === col("nb.doc_id"))
      .withColumn("jaccard", col("shared") / (col("na.nsh") + col("nb.nsh") - col("shared")))
      .filter(col("jaccard") >= 0.5)
      .select(col("da"), col("db"), col("shared"), col("jaccard"))
      .persist()
    // Materialize the (threshold-bounded, tiny) pair set; the shared
    // shingle index stays pinned in the memo for the MinHash path and is
    // released by SessionMemo.clear at end of run.
    out.count()
    out
  }

  private val minhashK = 16 // signature length
  // 8 bands x 2 rows tuned for the 0.5 threshold: P(candidate | J) =
  // 1-(1-J^2)^8 -> 0.90 at J=0.5, ~1.0 at J=0.9. (4x4 banding missed real
  // J>=0.9 pairs on the testdata — caught by LlmOpsSpec's recall check.)
  private val minhashBands = 8
  private val minhashRows = minhashK / minhashBands

  /** The j-th MinHash hash family, ENGINE-NEUTRAL so the whole LSH
    * pipeline is oracle-pairable: 32-bit integers carved out of
    * md5("<j/4>:" || shingle) — four 8-hex-char chunks per digest, so 16
    * families cost 4 md5 calls per shingle row (not 16). 32 bits is the
    * classic MinHash register width: the estimator needs a near-uniform
    * permutation, not collision-free 64-bit hashing. The DuckDB mirror is
    * CAST(('0x' || substr(md5(...), off, 8)) AS BIGINT) — same digest,
    * same chunk, same value. */
  private def mhHashOf(j: Int, shingle: Column): Column = {
    val group = j / 4
    val off = 1 + 8 * (j % 4)
    conv(substring(md5(concat_ws(":", lit(group.toString), shingle)), off, 8),
      16, 10).cast("long")
  }
  private def mhHash(j: Int): Column = mhHashOf(j, col("s"))
  private def mhHashSql(j: Int): String = {
    val group = j / 4
    val off = 1 + 8 * (j % 4)
    s"CAST(('0x' || substr(md5('$group:' || s), $off, 8)) AS BIGINT)"
  }

  /** MinHash signature columns h0..h15: min over the doc's shingles of
    * each [[mhHash]] family, hashed INLINE per (doc, shingle) index row.
    * A hash-each-distinct-shingle-once + join-back variant was measured
    * (round 9, sf0.1 isolate, median-of-3): 6.15s vs 4.33s for this
    * spelling — the distinct + join add two wide string-keyed shuffles
    * to save map-side md5 work that 32 cores absorb in parallel (4
    * digests/row via partial-agg CSE, zero shuffle). Per-occurrence
    * hashing is also the 100 TB-safe choice: compute scales out with
    * executors, shuffles don't. */
  private def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until minhashK).map(j => min(mhHash(j)).as(s"h$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded view of a signature frame: one row per (doc, band), bucket
    * key = (band, raw signature registers). The RAW register pair is
    * injective on the band, so Spark and the oracle agree pair-for-pair
    * (a compacted band HASH would admit engine-local spurious
    * collisions). Shared by the batch LSH query and the incremental
    * delta-vs-base probe. */
  private def bandedSig(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until minhashBands).map { b =>
      struct(lit(b).as("band") +: (0 until minhashRows).map(r =>
        col(s"h${minhashRows * b + r}").as(s"r$r")): _*)
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.*"))
  }

  /** Per-doc MinHash LSH band keys as a PURE PROJECTION — no groupBy:
    * each signature entry is array_min over the SAME md5-derived
    * [[mhHashOf]] families the batch pipeline uses (aligned in round 8
    * — the twin previously hashed with xxhash64 and would have
    * disagreed with a batch-built band index), and the band key is the
    * raw signature-register pair rendered as a string (injective, like
    * the batch bucket join). Projection-only is what makes the SAME
    * plan bind in Structured Streaming: a per-doc streaming aggregate
    * would need a watermark and delay every flag by it, while a
    * projection flags in the arrival micro-batch. The 4 distinct md5
    * digests are computed ONCE per shingle into an inner array and the
    * 16 chunk values carved from them by substring — HOF lambdas are
    * interpreted (no whole-stage codegen, no subexpression
    * elimination), so inlining mhHashOf 16× would genuinely run 16
    * digests per shingle. Each signature register is then an array_min
    * over one element_at pass. Shingles here
    * are UNCAPPED (a stream doc cannot know corpus dfs; the df-capped
    * inverted index remains the batch path's optimization). Emits one
    * row per (original row, band): `band`, `bh` appended to the input
    * columns. Package-visible for the streaming near-dup twin
    * (EventStreams.nearDupFlags). */
  private[graft] def minhashBandKeys(df: DataFrame, n: Int = 3): DataFrame = {
    def sig(j: Int): Column =
      array_min(transform(col("__hh"), a => element_at(a, j + 1)))
    val bandCols = (0 until minhashBands).map { b =>
      concat_ws(",",
        (minhashRows * b until minhashRows * (b + 1)).map(sig): _*)
    }
    val keep = df.columns.toSeq.map(col)
    df.withColumn("t", toks(col("text")))
      .filter(size(col("t")) >= n)
      .withColumn("__sh", expr(ngramExpr(n)))
      .withColumn("__dg", transform(col("__sh"),
        x => array((0 until minhashK / 4).map(g =>
          md5(concat_ws(":", lit(g.toString), x))): _*)))
      .withColumn("__hh", transform(col("__dg"),
        d => array((0 until minhashK).map { j =>
          conv(substring(element_at(d, j / 4 + 1), 1 + 8 * (j % 4), 8), 16, 10)
            .cast("long")
        }: _*)))
      .select(keep :+ posexplode(array(bandCols: _*)).as(Seq("band", "bh")): _*)
  }

  /** The full MinHash-LSH pipeline as ANSI SQL over the same md5-derived
    * hash families — generated, not hand-written, so the seed/band
    * constants can never drift from the Spark plan. The banded frame is
    * an 8-way UNION ALL (SQL's spelling of the posexplode); the bucket
    * join keys on the RAW per-band signature rows, which is injective
    * where a compacted band hash would not be. */
  private def minhashOracleSql: String = {
    val sigCols = (0 until minhashK)
      .map(j => s"min(${mhHashSql(j)}) AS h$j").mkString(",\n               ")
    val bandSelects = (0 until minhashBands).map { b =>
      val rows = (0 until minhashRows)
        .map(r => s"h${minhashRows * b + r} AS r$r").mkString(", ")
      s"SELECT doc_id, $b AS band, $rows FROM sig"
    }.mkString("\n        UNION ALL ")
    val rowEq = (0 until minhashRows).map(r => s"a.r$r = b.r$r").mkString(" AND ")
    val matches = (0 until minhashK)
      .map(j => s"(CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
      WITH toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toksrc),
      sh0 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      rare AS (
        SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $jaccardMaxDf),
      sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
      sig AS (
        SELECT doc_id, $sigCols
        FROM sh GROUP BY doc_id),
      banded AS (
        $bandSelects),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM banded a JOIN banded b
          ON a.band = b.band AND $rowEq AND a.doc_id < b.doc_id)
      SELECT c.da, c.db,
             ($matches) / $minhashK.0 AS est_jaccard
      FROM cand c
      JOIN sig sa ON c.da = sa.doc_id
      JOIN sig sb ON c.db = sb.doc_id
      WHERE ($matches) / $minhashK.0 >= 0.5
      ORDER BY da, db"""
  }

  /** MinHash + LSH banding near-dup candidates (the 100 TB-scale path for
    * E2): signature -> per-band buckets -> bucket join -> candidate pairs
    * with estimated Jaccard = matching-minhash fraction. Never
    * materializes all pairs; the shuffle key is the band bucket. ORACLE-
    * PAIRED since round 8: the hash families are engine-neutral md5
    * chunks ([[mhHash]]), the banding is seeded and partition-invariant,
    * so the candidate set AND the estimates are deterministic and DuckDB
    * reproduces them exactly ([[minhashOracleSql]]). LlmOpsSpec keeps the
    * independent recall check against the exact-Jaccard twin. */
  private val e2MinHash = GraftQuery(
    "llm_e2_minhash_lsh_candidates",
    "MinHash(16) + 8-band LSH bucket join, estimated Jaccard (E2)",
    Some(minhashOracleSql),
    (s, dir) => memoized(s, dir, "minhash_candidates") {
      // df-capped shingles (shared, memoized index — same jaccardMaxDf cap
      // as the exact-Jaccard twin, so the spec's recall check compares like
      // for like). The signature frame feeds THREE plan branches (the
      // banded explode + both sides of the estimated-Jaccard re-join);
      // persist it or each branch re-runs the signature agg (a measured
      // 1.2s -> 16.2s regression when this was left lazy).
      val sig = minhashSignatures(cappedShingleIndex(s, dir)).persist()
      val banded = bandedSig(sig)
      val rowEq = (0 until minhashRows)
        .map(r => col(s"a.r$r") === col(s"b.r$r")).reduce(_ && _)
      val cand = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && rowEq &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val matches = (0 until minhashK)
        .map(j => when(col(s"sa.h$j") === col(s"sb.h$j"), 1).otherwise(0))
        .reduce(_ + _)
      val out = cand
        .join(sig.as("sa"), col("da") === col("sa.doc_id"))
        .join(sig.as("sb"), col("db") === col("sb.doc_id"))
        .select(col("da"), col("db"),
          (matches.cast("double") / minhashK).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
        .orderBy("da", "db")
        .persist()
      // materialize the (banding-threshold-bounded, tiny) candidate set
      // while the signatures are cached, then release the signatures —
      // only the candidates stay pinned, owned by the memo
      out.count()
      sig.unpersist()
      out
    })

  // ---------------------------------------------------------------------
  // E2 incremental: delta batch vs a STANDING base index (the daily-ingest
  // shape — dedup new documents against the existing corpus without
  // recomputing anything base-sided)
  // ---------------------------------------------------------------------

  /** Delta membership reuses the E1 incremental split (doc_id residue
    * [[incomingRem]] mod [[incomingMod]] models the daily batch;
    * production passes the real batch table). */
  private def incrDocs(s: SparkSession, dir: String, base: Boolean): DataFrame = {
    val d = docs(s, dir)
    if (base) d.filter(col("doc_id") % incomingMod =!= incomingRem)
    else d.filter(col("doc_id") % incomingMod === incomingRem)
  }

  /** The standing index's stop-shingle set: df computed over the BASE
    * split only — the index predates the delta, so its df statistics
    * cannot see delta documents. Threshold-bounded (shingles past the
    * cap), memoized: it filters both the base store build and every
    * incoming batch. */
  private def incrBaseStop(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "incr_base_stop") {
      shinglesOf(incrDocs(s, dir, base = true))
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .filter(col("df") > jaccardMaxDf)
        .select(col("s"))
    }

  /** The standing base shingle store (df-capped inverted index over the
    * base split) — what an operational near-dup pipeline persists
    * between ingests, here memoized per (session, dir). Built ONCE; the
    * delta path only probes it. */
  private def incrBaseShingles(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "incr_base_shingles") {
      shinglesOf(incrDocs(s, dir, base = true))
        .join(incrBaseStop(s, dir), Seq("s"), "left_anti")
    }

  /** The standing base MinHash signature frame — the second half of the
    * persisted index. Built ONCE from [[incrBaseShingles]]; the delta
    * path joins it for banding and the estimate, never recomputes it
    * (IncrementalDedupSpec pins build-once via the memo's build log). */
  private def incrBaseSig(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "incr_base_sig") {
      minhashSignatures(incrBaseShingles(s, dir))
    }

  /** The incremental pipeline as ANSI SQL — same md5-derived hash
    * families and banding as [[minhashOracleSql]], but with the shingle
    * df-cap computed over the base split only (the standing index owns
    * its df statistics) and an asymmetric delta×base bucket join. */
  private def incrementalOracleSql: String = {
    val sigCols = (0 until minhashK)
      .map(j => s"min(${mhHashSql(j)}) AS h$j").mkString(",\n               ")
    def bandSelects(src: String) = (0 until minhashBands).map { b =>
      val rows = (0 until minhashRows)
        .map(r => s"h${minhashRows * b + r} AS r$r").mkString(", ")
      s"SELECT doc_id, $b AS band, $rows FROM $src"
    }.mkString("\n        UNION ALL ")
    val rowEq = (0 until minhashRows).map(r => s"d.r$r = b.r$r").mkString(" AND ")
    val matches = (0 until minhashK)
      .map(j => s"(CASE WHEN sd.h$j = sb.h$j THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
      WITH toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toksrc),
      sh0 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      base0 AS (SELECT doc_id, s FROM sh0 WHERE doc_id % $incomingMod <> $incomingRem),
      stop AS (SELECT s FROM base0 GROUP BY s HAVING count(*) > $jaccardMaxDf),
      bsh AS (
        SELECT base0.doc_id, base0.s FROM base0
        LEFT JOIN stop ON base0.s = stop.s WHERE stop.s IS NULL),
      dsh AS (
        SELECT sh0.doc_id, sh0.s FROM sh0
        LEFT JOIN stop ON sh0.s = stop.s
        WHERE sh0.doc_id % $incomingMod = $incomingRem AND stop.s IS NULL),
      bsig AS (SELECT doc_id, $sigCols FROM bsh GROUP BY doc_id),
      dsig AS (SELECT doc_id, $sigCols FROM dsh GROUP BY doc_id),
      bband AS (
        ${bandSelects("bsig")}),
      dband AS (
        ${bandSelects("dsig")}),
      cand AS (
        SELECT DISTINCT d.doc_id AS delta_id, b.doc_id AS base_id
        FROM dband d JOIN bband b ON d.band = b.band AND $rowEq),
      shr AS (
        SELECT c.delta_id, c.base_id, count(*) AS shared
        FROM cand c
        JOIN dsh x ON x.doc_id = c.delta_id
        JOIN bsh y ON y.doc_id = c.base_id AND y.s = x.s
        GROUP BY c.delta_id, c.base_id),
      nd AS (SELECT doc_id, count(*) AS nsh FROM dsh GROUP BY doc_id),
      nb AS (SELECT doc_id, count(*) AS nsh FROM bsh GROUP BY doc_id)
      SELECT r.delta_id, r.base_id,
             ($matches) / $minhashK.0 AS est_jaccard,
             r.shared,
             r.shared / (na.nsh + nbb.nsh - r.shared) AS jaccard
      FROM shr r
      JOIN dsig sd ON r.delta_id = sd.doc_id
      JOIN bsig sb ON r.base_id = sb.doc_id
      JOIN nd na ON r.delta_id = na.doc_id
      JOIN nb nbb ON r.base_id = nbb.doc_id
      WHERE r.shared / (na.nsh + nbb.nsh - r.shared) >= 0.5
      ORDER BY delta_id, base_id"""
  }

  /** Incremental delta-vs-base near-dup dedup (E2's daily-ingest shape,
    * the operational complement of the batch LSH query): the incoming
    * batch's band keys are joined to the MEMOIZED standing base index
    * (signatures + df-capped shingle store, [[incrBaseSig]]/
    * [[incrBaseShingles]]), candidates are confirmed with exact Jaccard
    * over the capped shingle sets, and only pairs with J >= 0.5 emit —
    * (delta_id, base_id, est_jaccard, shared, jaccard).
    *
    * 100 TB posture: base work happens ONCE (the standing index); each
    * ingest pays delta-sized signature/banding work plus a bucket join
    * whose probe side is batch-sized, and the exact confirm fans out
    * from the (banding-bounded) candidate set — never a base self-join,
    * never a base recompute. Delta docs can carry shingles the base has
    * never seen; only shingles past the BASE df-cap are dropped (an
    * incoming batch cannot change the standing index's df statistics
    * mid-probe). */
  private val e2Incremental = GraftQuery(
    "llm_e2_incremental_dedup",
    "delta batch vs memoized base LSH index + exact-Jaccard confirm (E2)",
    Some(incrementalOracleSql),
    (s, dir) => graft.SessionMemo.memoized(s, dir, "incr_dedup") {
      val baseSh = incrBaseShingles(s, dir)
      val baseSig = incrBaseSig(s, dir)
      // delta-side frames are query-local: persisted for their multiple
      // plan branches (shingles feed sig + confirm + counts; sig feeds
      // banding + estimate), released once the tiny result materializes
      val deltaSh = shinglesOf(incrDocs(s, dir, base = false))
        .join(incrBaseStop(s, dir), Seq("s"), "left_anti")
        .persist()
      val deltaSig = minhashSignatures(deltaSh).persist()
      val rowEq = (0 until minhashRows)
        .map(r => col(s"d.r$r") === col(s"b.r$r")).reduce(_ && _)
      val cand = bandedSig(deltaSig).as("d")
        .join(bandedSig(baseSig).as("b"), col("d.band") === col("b.band") && rowEq)
        .select(col("d.doc_id").as("delta_id"), col("b.doc_id").as("base_id"))
        .distinct()
      // exact-Jaccard confirm, candidate-scoped: fan the (tiny) candidate
      // set out by the delta docs' shingles, match base shingles by
      // (doc, shingle) — the join is bounded by candidates × shingles/doc
      val shared = cand
        .join(deltaSh.as("x"), col("delta_id") === col("x.doc_id"))
        .join(baseSh.as("y"),
          col("base_id") === col("y.doc_id") && col("x.s") === col("y.s"))
        .groupBy(col("delta_id"), col("base_id"))
        .agg(count(lit(1)).as("shared"))
      val nd = deltaSh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val nb = baseSh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val matches = (0 until minhashK)
        .map(j => when(col(s"sd.h$j") === col(s"sb.h$j"), 1).otherwise(0))
        .reduce(_ + _)
      val out = shared
        .join(deltaSig.as("sd"), col("delta_id") === col("sd.doc_id"))
        .join(baseSig.as("sb"), col("base_id") === col("sb.doc_id"))
        .join(nd.as("na"), col("delta_id") === col("na.doc_id"))
        .join(nb.as("nbb"), col("base_id") === col("nbb.doc_id"))
        .withColumn("jaccard",
          col("shared") / (col("na.nsh") + col("nbb.nsh") - col("shared")))
        .filter(col("jaccard") >= 0.5)
        .select(col("delta_id"), col("base_id"),
          (matches.cast("double") / minhashK).as("est_jaccard"),
          col("shared"), col("jaccard"))
        .orderBy("delta_id", "base_id")
        .persist()
      out.count()
      deltaSh.unpersist(); deltaSig.unpersist()
      out
    })

  /** The SimHash pipeline as ANSI SQL — 64 per-bit vote sums over the
    * md5-derived token hash ([[graft.functions.TextHash.md5Long64]]'s
    * exact SQL twin: signed 32-bit chunk assembly), signature packed
    * with the sign bit spelled as the BIGINT minimum, chunk pigeonhole
    * + bit_count(xor) verify. Generated so the bit width/chunking can
    * never drift from the Spark expression. */
  private def simhashOracleSql: String = {
    val bitSums = (0 until 64)
      .map(i => s"SUM(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n               ")
    val sigBits = (0 until 64).map { i =>
      val bit = if (i == 63) "(-9223372036854775807 - 1)" else s"${1L << i}"
      s"(CASE WHEN b$i > 0 THEN $bit ELSE 0 END)"
    }.mkString("\n             + ")
    s"""
      WITH tk AS (
        -- per-PAYLOAD grouping key (md5(text)), not per doc_id: the
        -- engine computes one signature per ROW, so a doc_id reused
        -- with a DIFFERENT payload (key-corruption axis, round 16)
        -- carries TWO signatures — a doc_id-only GROUP BY would blend
        -- both payloads' token votes into a signature neither row has.
        -- Exact duplicate rows land in one group with doubled votes
        -- (signs unchanged — same signature), and on a key-unique
        -- corpus the key is equivalent to doc_id alone.
        SELECT doc_id, md5(text) AS payload,
               unnest(string_split(text, ' ')) AS tok FROM documents),
      th AS (
        SELECT doc_id, payload,
          ((c1 - CASE WHEN c1 >= 2147483648 THEN 4294967296 ELSE 0 END)
             * 4294967296 + c2) AS h
        FROM (
          SELECT doc_id, payload,
            CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS c1,
            CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS c2
          FROM tk)),
      bits AS (
        SELECT doc_id, payload, $bitSums
        FROM th GROUP BY doc_id, payload),
      sig AS (
        SELECT doc_id,
          ($sigBits) AS simhash
        FROM bits),
      ch AS (
        SELECT doc_id, simhash, c.chunk, (simhash >> (16 * c.chunk)) & 65535 AS cv
        FROM sig, (VALUES (0), (1), (2), (3)) c(chunk)),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
          CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        FROM ch a JOIN ch b
          ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id)
      SELECT da, db, hamming FROM cand
      WHERE hamming <= 6
      ORDER BY da, db"""
  }

  /** SimHash near-dup: 64-bit signature = sign of per-bit tf-weighted
    * sums of token hashes; near-dup candidates via 16-bit chunk
    * pigeonholing (hamming <= 6 implies at least one of four 16-bit chunks
    * equal... not strictly — <=3 guarantees it; 6 is the usual recall
    * trade-off), verified with bit_count on the XOR. ORACLE-PAIRED since
    * round 8: the token hash is md5-derived on both engines
    * ([[simhashOracleSql]]); invariants stay covered in LlmOpsSpec. */
  private val e2SimHash = GraftQuery(
    "llm_e2_simhash_pairs",
    "SimHash64 signatures + chunk-bucketed hamming<=6 pairs (E2)",
    Some(simhashOracleSql),
    (s, dir) => {
      // one codegen'd pass per doc (SimHash64 expression) — no explode, no
      // 64-column aggregate, no shuffle until the chunk-bucket join
      val sig = docs(s, dir).select(col("doc_id"),
        graft.functions.TextFunctions.simhash64(toks(col("text"))).as("simhash"))
      val chunks = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), 16 * c).bitwiseAND(lit(0xFFFFL))): _*))
          .as(Seq("chunk", "cv")))
      chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy("da", "db")
    })

  /** Min-label propagation connected components with POINTER JUMPING
    * (path halving) over an undirected edge set: every node starts
    * labeled with itself; each round (a) pushes labels across edges and
    * keeps the min, then (b) re-labels every node with its label's OWN
    * label — valid because a node's label only ever decreases, so
    * label(label(v)) <= label(v), and label(v) is always a node id in
    * v's component. The halving step makes label chains collapse
    * geometrically, so `maxIter` rounds cover graph diameters on the
    * order of 2^maxIter rather than maxIter — a plain-propagation loop
    * capped at 20 silently mislabels any chain-shaped near-dup graph
    * (template corpora) deeper than 20, which is exactly the failure
    * the [[require]] below and this doubling exist to preclude. The
    * driver only ever reads a one-row aggregate per round (sum of
    * labels — strictly decreasing until the fixpoint), never the data.
    * Large-star/small-star family, as used for dedup-cluster collapse
    * at corpus scale; dup-cluster graphs have tiny diameters so the
    * round count stays low in practice. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // nodes: (doc_id); edges: (da, db) — made undirected here. The edge
    // set is persisted: it is re-joined every round, and its lineage (an
    // inverted-index or LSH candidate join) is far more expensive than
    // the propagation itself.
    val und = edges.select(col("da").as("src"), col("db").as("dst"))
      .unionByName(edges.select(col("db").as("src"), col("da").as("dst")))
      .persist()
    // Pin-and-rebase lineage truncation: each round's self-join
    // references its input twice, so round i+1's LOGICAL plan would
    // embed round i's labels four times — without per-round truncation
    // the plan tree grows 4^rounds and AQE's plan-string rendering
    // alone OOMs (measured: 2 GiB plan string on a 120-node chain).
    // persist() alone caches data but keeps lineage (the BpeMerges
    // iteration lesson). localCheckpoint truncates, but its blocks are
    // NOT freed by Dataset.unpersist (they belong to an internal RDD
    // outside the cache manager) — up to maxIter corpus-sized label
    // frames would sit in executor storage until the driver GC runs the
    // ContextCleaner (periodic-GC default: 30 min). So: persist +
    // materialize, then REBASE the frame the next round consumes on the
    // materialized RDD (createDataFrame over pinned.rdd = a leaf
    // LogicalRDD plan, constant size) while keeping the PINNED handle,
    // whose unpersist() deterministically frees the round's blocks.
    // Cluster caveat: once a pinned round is freed, earlier lineage is
    // gone, so an executor loss mid-loop fails the job — a long-running
    // production deployment should point sc.setCheckpointDir at durable
    // storage and checkpoint() each round instead; the truncation
    // requirement is the same either way.
    def pinTruncated(df: DataFrame): (DataFrame, DataFrame) = {
      val pinned = df.persist()
      pinned.count()
      (pinned.sparkSession.createDataFrame(pinned.rdd, pinned.schema), pinned)
    }
    // Materialize AND read the label sum in ONE job: the sum aggregate
    // scans every partition of the freshly-persisted frame, which is
    // exactly what the separate count() did — fusing them removes one
    // driver-scheduled job per round (the loop is driver-round-trip
    // bound at any scale: each job is a full scheduler cycle while the
    // cluster idles). null-safe 1-row read: sum over an EMPTY frame is
    // SQL NULL, and getLong would NPE — an empty corpus must yield
    // empty labels, not a crash.
    def pinSummed(df: DataFrame): (DataFrame, DataFrame, Long) = {
      val pinned = df.persist()
      val r = pinned.agg(sum(col("label"))).head()
      val s = if (r.isNullAt(0)) 0L else r.getLong(0)
      (pinned.sparkSession.createDataFrame(pinned.rdd, pinned.schema), pinned, s)
    }
    var (labels, pin, prevSum) =
      pinSummed(nodes.select(col("doc_id"), col("doc_id").as("label")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val pushed = und.join(labels, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("label"))
      // (a) edge push + min
      val (pm, pmPin) = pinTruncated(labels.unionByName(pushed)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label")))
      // (b) path halving: label <- label's label. Inner join is total —
      // every label is a node id and pm carries one row per node — and
      // the parent's label is <= the child's (monotonicity), so this
      // only ever lowers labels. Two shuffles of a narrow (long, long)
      // frame buy geometric chain collapse. The halved frame's
      // materialization and its convergence sum share one job
      // (pinSummed) — 2 jobs per round instead of 3.
      val (nl, nlPin, s) = pinSummed(pm.as("c")
        .join(pm.as("p"), col("c.label") === col("p.doc_id"))
        .select(col("c.doc_id"), col("p.label").as("label")))
      pmPin.unpersist()
      pin.unpersist()
      labels = nl
      pin = nlPin
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    und.unpersist()
    // Labels only ever decrease element-wise, so an unchanged sum IS the
    // fixpoint; exiting at maxIter without it would hand back wrong
    // cluster ids with no signal (a chain-shaped near-dup graph with
    // diameter > maxIter — pathological template corpora — is exactly
    // the case that must fail loudly, not silently).
    require(converged,
      s"connectedComponents did not reach the label fixpoint in $maxIter rounds " +
        "(graph diameter exceeds maxIter); raise maxIter or densify the edge set")
    // return the PINNED frame, not the rebased leaf view: the caller's
    // unpersist() must actually free the final round's blocks
    pin
  }

  /** The cluster-label CTE both dedup oracles share: exact + near-dup
    * edges, recursive transitive closure, min-label per doc. MUST stay
    * the leading token of the query — DuckDB requires `WITH RECURSIVE`
    * first. */
  private lazy val clusterLabelsCte = s"""
      WITH RECURSIVE toksrc AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 3),
      idx AS (
        SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM toksrc),
      sh0 AS (
        SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s FROM idx),
      rare AS (
        SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $jaccardMaxDf),
      sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN rare USING (s)),
      n AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id),
      jpairs AS (
        SELECT da, db FROM (
          SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2) p
        JOIN n na ON p.da = na.doc_id
        JOIN n nb ON p.db = nb.doc_id
        WHERE p.shared / (na.nsh + nb.nsh - p.shared) >= 0.5),
      epairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM documents a JOIN documents b
          ON a.text = b.text AND a.doc_id < b.doc_id),
      und AS (
        SELECT da AS s, db AS t FROM jpairs UNION SELECT db, da FROM jpairs
        UNION SELECT da, db FROM epairs UNION SELECT db, da FROM epairs),
      reach(s, t) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s),
      labels AS (
        SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s)"""

  /** The materialized (doc_id, cluster_id) label frame — memo-shared by
    * the clusters query and the apply pass. Spark runs the
    * linear-shuffle label propagation; the oracle's recursive
    * transitive-closure CTE is fine at oracle scale. Exact-dup edges
    * join on the 256-bit content hash, not raw text: the shuffle
    * carries 32-byte keys instead of whole document bodies (sha256
    * collisions are not a practical concern).
    *
    * Exact-dup edges are a STAR per hash group (canonical = min doc_id,
    * one edge canonical→member), never the pairwise self-join: a
    * boilerplate string duplicated k times must contribute k-1 edges,
    * not k(k-2)/2 — at web-corpus scale k reaches ~10⁶ (that is WHY
    * one dedups) and the quadratic form emits ~5·10¹¹ rows from a
    * single group onto one shuffle key. The star spans the same
    * connected component (every member reaches the canonical in one
    * hop), so labels are unchanged, and exact groups now converge in
    * ≤2 propagation rounds instead of scaling with pair depth. */
  /** Exact-dup STAR edges over a (doc_id, content_hash) frame:
    * canonical = min doc_id per hash group, one (canonical, member)
    * edge per non-canonical member — k-1 edges for a k-group, linear
    * where the pairwise self-join is quadratic (see [[dedupClusters]]).
    * Spelled as a window min over the hash partition: ONE shuffle of
    * the narrow hash frame and no join (the groupBy-then-join-back
    * spelling shuffles the frame for the aggregate and again for the
    * re-attach unless AQE happens to reuse the exchange). Shape-pinned
    * by LlmOpsSpec ("star edges are linear...": exactly k-1 edges, all
    * anchored at the min). */
  private[llmops] def exactStarEdges(h: DataFrame): DataFrame = {
    val perHash = Window.partitionBy(col("content_hash"))
    h.withColumn("canonical", min(col("doc_id")).over(perHash))
      .filter(col("doc_id") =!= col("canonical"))
      .select(col("canonical").as("da"), col("doc_id").as("db"))
  }

  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    memoized(s, dir, "dedup_clusters") {
      val d = docs(s, dir)
      val exact = exactStarEdges(
        d.select(col("doc_id"), sha2(col("text"), 256).as("content_hash")))
      // the pair set is shared with llm_e2_ngram_jaccard_pairs via the
      // session memo — do NOT unpersist it here
      val near = jaccardPairs(s, dir).select(col("da"), col("db"))
      val labels = connectedComponents(d.select(col("doc_id")), exact.unionByName(near))
      val out = labels
        .select(col("doc_id"), col("label").as("cluster_id"))
        .orderBy("doc_id")
        .persist()
      out.count() // materialize, then release the propagation cache
      labels.unpersist()
      out
    }

  /** Dedup clusters: connected components over the union of exact-dup
    * edges (equal sha256) and near-dup edges (3-gram Jaccard >= 0.5);
    * canonical = min doc_id per cluster. The oracle reproduces the
    * components with a recursive transitive-closure CTE — fine at oracle
    * scale, where Spark runs the linear-shuffle label propagation. */
  private val e2Clusters = GraftQuery(
    "llm_e2_dedup_clusters",
    "connected-component dedup clusters over exact+near-dup edges (E2)",
    Some(s"""$clusterLabelsCte
      SELECT doc_id, cluster_id FROM labels
      ORDER BY doc_id"""),
    (s, dir) => dedupClusters(s, dir))

  /** Apply the dedup clustering: keep each cluster's canonical (minimum
    * doc_id) member, reporting how many documents merged into it — the
    * doc-level twin of [[e2SpanCut]], turning near-dup DETECTION into an
    * actually-deduplicated corpus. One aggregation over the
    * (memo-shared, already materialized) label frame, shuffled on
    * cluster_id — a key whose cardinality scales with the corpus — then
    * a join back to documents to re-attach attributes. */
  private val e2DedupApply = GraftQuery(
    "llm_e2_dedup_apply",
    "surviving canonical corpus after cluster dedup, with merge counts (E2)",
    Some(s"""$clusterLabelsCte,
      g AS (
        SELECT cluster_id AS doc_id, count(*) AS n_merged
        FROM labels GROUP BY cluster_id)
      SELECT g.doc_id, d.lang, g.n_merged
      FROM g JOIN documents d USING (doc_id)
      ORDER BY doc_id"""),
    (s, dir) => {
      val g = dedupClusters(s, dir)
        .groupBy(col("cluster_id").as("doc_id"))
        .agg(count(lit(1)).as("n_merged"))
      g.join(docs(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_merged"))
        .orderBy("doc_id")
    })


  /** LEAKAGE-SAFE corpus split: the train/val/test coin is flipped on
    * the CLUSTER CANONICAL's content hash, not the doc's own — so every
    * member of a near-dup cluster (exact dups AND Jaccard >= 0.5
    * near-dups) lands in the same split by construction. A plain
    * content-hash split ([[e4Split]]) only co-locates exact duplicates;
    * a near-copy of a training doc falling into test is precisely the
    * contamination eval suites get burned by. One extra broadcast-sized
    * join against the memo-shared label frame on top of the split scan;
    * `n_clusters` counts unique clusters per split as the audit that no
    * cluster straddles (sum over splits == total clusters). */
  private val e2ClusterSafeSplit = GraftQuery(
    "llm_e2_cluster_safe_split",
    "train/val/test split keyed on dedup-cluster canonical hash — near-dups never straddle splits (E2)",
    Some(s"""$clusterLabelsCte,
      b AS (
        SELECT l.doc_id, l.cluster_id,
               CAST(('0x' || substr(md5(c.text), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM labels l JOIN documents c ON l.cluster_id = c.doc_id),
      sp AS (
        SELECT b.doc_id, b.cluster_id,
               CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
        FROM b)
      SELECT sp.split,
             count(*) AS n_docs,
             count(DISTINCT sp.cluster_id) AS n_clusters,
             CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
      FROM sp JOIN documents d USING (doc_id)
      GROUP BY sp.split
      ORDER BY sp.split"""),
    (s, dir) => {
      val canonBucket = docs(s, dir)
        .select(col("doc_id").as("cluster_id"),
          (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100)
            .as("bucket"))
      dedupClusters(s, dir)
        .join(canonBucket, Seq("cluster_id"))
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "val").otherwise("test"))
        .join(docs(s, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("cluster_id")).as("n_clusters"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    })

  // domain-mixing weights: target sampling rate per language domain.
  // Chosen so thresholds weight * 2^32 are exact integers (the coin
  // compare stays bit-identical across engines).
  private val mixWeights: Seq[(String, Double)] =
    Seq("de" -> 0.5, "en" -> 1.0, "es" -> 0.25, "fr" -> 0.5, "zh" -> 0.25)

  /** Domain-weighted subsampling (corpus mixing): keep each doc with
    * probability weight(lang), decided by a deterministic
    * content-independent coin (first 8 md5 hex chars of doc_id as a
    * uniform 32-bit integer) — the Pile/ROOTS-style domain reweighting
    * knob, reproducible across engines, runs, and epochs. The weights
    * table is tiny and broadcast; the corpus is scanned once with a
    * partial+final agg for the per-domain audit counts. */
  private val e4Mix = GraftQuery(
    "llm_e4_domain_mix",
    "deterministic domain-weighted subsampling (corpus mixing) per language (E4)",
    Some(s"""
      WITH w(lang, weight) AS (VALUES ${mixWeights.map { case (l, p) => s"('$l', CAST($p AS DOUBLE))" }.mkString(", ")}),
      d AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS u
        FROM documents)
      SELECT d.lang, w.weight,
             count(*) AS n_docs,
             count(*) FILTER (WHERE d.u < CAST(w.weight * 4294967296 AS BIGINT)) AS n_kept,
             CAST(count(*) FILTER (WHERE d.u < CAST(w.weight * 4294967296 AS BIGINT)) AS DOUBLE)
               / count(*) AS kept_rate
      FROM d JOIN w ON d.lang = w.lang
      GROUP BY d.lang, w.weight
      ORDER BY d.lang"""),
    (s, dir) => {
      import s.implicits._
      val wDf = mixWeights.toDF("lang", "weight")
      val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
      val kept = count(when(col("u") < (col("weight") * 4294967296L).cast("long"), 1))
      docs(s, dir)
        .withColumn("u", u)
        .join(broadcast(wDf), Seq("lang"))
        .groupBy(col("lang"), col("weight"))
        .agg(count(lit(1)).as("n_docs"), kept.as("n_kept"),
          (kept.cast("double") / count(lit(1))).as("kept_rate"))
        .orderBy("lang")
    })

  /** Deterministic corpus split (train/val/test) by content hash — the
    * standard leakage-safe way to split training data (split follows the
    * CONTENT, so exact duplicates land in the same split; random() would
    * not be reproducible across engines or runs). 8 hex chars of md5 →
    * bucket mod 100 → 90/5/5. */
  private val e4Split = GraftQuery(
    "llm_e4_hash_split",
    "deterministic content-hash train/val/test split + per-split stats (E4)",
    Some("""
      WITH b AS (
        SELECT doc_id, lang, n_chars,
               CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
             lang,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM b
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) =>
      docs(s, dir)
        .withColumn("bucket", conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 100)
        .withColumn("split",
          when(col("bucket") < 90, "train").when(col("bucket") < 95, "val").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy("split", "lang"))

  // n-gram length for eval-set decontamination. Real pipelines use 8-13
  // grams (GPT-3 used 13, PaLM 8); 5 keeps the check meaningful on the
  // short synthetic docs while exercising the identical plan shape.
  private[graft] val decontamN = 5

  /** Eval split membership rule (every `evalSplitMod`-th doc_id) shared
    * by the batch query and the streaming twin, so both sides agree on
    * what counts as a training doc. */
  private[graft] val evalSplitMod = 50
  private[graft] def isEvalDoc(c: Column): Column = c % evalSplitMod === 0
  private[graft] def isTrainDoc(c: Column): Column = c % evalSplitMod =!= 0

  /** The static eval-split n-gram index (modeled as every 50th doc_id;
    * production passes the real benchmark table) — the broadcast build
    * side of both the batch query and the streaming twin. */
  private[graft] def evalNgramIndex(s: SparkSession, dir: String): DataFrame =
    docNgrams(docs(s, dir).filter(isEvalDoc(col("doc_id"))), decontamN)
      .select(col("doc_id").as("eval_id"), col("s"))

  /** Benchmark decontamination: flag every training doc that shares ANY
    * `decontamN`-gram with the held-out eval split — the standard
    * pre-training hygiene pass (GPT-3 §C / PaLM style). This is NOT
    * near-dup detection: the predicate is asymmetric (train vs eval) and
    * binary (one shared n-gram contaminates; no Jaccard threshold). The
    * eval split is modeled as every 50th doc_id — production passes the
    * real benchmark table in its place, which is small BY CONSTRUCTION,
    * so the join broadcasts the eval n-gram index and the corpus-sized
    * train side never shuffles: one scan + broadcast hash join + partial
    * agg, the 100 TB shape. */
  private val e2Decontam = GraftQuery(
    "llm_e2_decontamination",
    s"eval-split $decontamN-gram decontamination, broadcast eval index (E2)",
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= $decontamN),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+${decontamN - 1}], ' ') AS s
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${decontamN - 1})) AS i FROM t)),
      ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
      SELECT tr.doc_id,
             count(DISTINCT ev.eval_id) AS n_eval_docs,
             count(DISTINCT tr.s) AS n_shared_ngrams
      FROM tr JOIN ev ON tr.s = ev.s
      GROUP BY tr.doc_id
      ORDER BY tr.doc_id"""),
    (s, dir) => {
      val ev = evalNgramIndex(s, dir)
      val tr = docNgrams(docs(s, dir).filter(isTrainDoc(col("doc_id"))), decontamN)
      tr.join(broadcast(ev), Seq("s"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
          countDistinct(col("s")).as("n_shared_ngrams"))
        .orderBy("doc_id")
    })

  /** Bloom-prefiltered decontamination — [[e2Decontam]]'s shape for when
    * the benchmark index outgrows broadcast. A 10M-n-gram eval index is
    * hundreds of MB broadcast but ~9 MB as a 1%-fpp Bloom filter; the
    * sketch rides INSIDE the plan (a literal on a codegen'd
    * [[graft.functions.BloomMightContain]] filter, like the PQ codebook
    * literals), the corpus-sized n-gram stream shrinks to fpp x corpus +
    * true positives BEFORE any exchange, and the exact join that removes
    * the false positives then only moves the survivor stream — a
    * SHUFFLED join here, deliberately not broadcast, because this
    * operator's premise is an index too big to broadcast (AQE may still
    * pick broadcast at test scale; that is its call, not the plan's
    * assumption).
    *
    * Result contract: IDENTICAL to [[e2Decontam]] — the Bloom admits
    * false positives only, and every survivor is re-verified by the
    * exact join, so the prefilter is invisible in the output. The oracle
    * is therefore the exact query's SQL verbatim, and the gate
    * hash-compares this path against it. Build discipline: the filter is
    * populated with `putBinary(<utf8 bytes>)` of each distinct eval
    * n-gram (ONE pass over the bounded eval split, combined per
    * partition then merged — bit-OR, so partition order is irrelevant)
    * and memoized per (session, dir) beside the frames it pairs with. */
  private val e2BloomDecontam = GraftQuery(
    "llm_e2_bloom_decontam",
    s"decontamination behind a plan-literal Bloom prefilter + exact shuffled join (E2)",
    Some(s"""
      -- exact decontamination SQL verbatim: the Bloom prefilter must be
      -- invisible in the result (false positives re-verified exactly)
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= $decontamN),
      sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+${decontamN - 1}], ' ') AS s
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${decontamN - 1})) AS i FROM t)),
      ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 50 = 0),
      tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 50 <> 0)
      SELECT tr.doc_id,
             count(DISTINCT ev.eval_id) AS n_eval_docs,
             count(DISTINCT tr.s) AS n_shared_ngrams
      FROM tr JOIN ev ON tr.s = ev.s
      GROUP BY tr.doc_id
      ORDER BY tr.doc_id"""),
    (s, dir) => {
      val bloom = decontamBloom(s, dir)
      val tr = docNgrams(docs(s, dir).filter(isTrainDoc(col("doc_id"))), decontamN)
        .filter(graft.functions.BloomExprs.bloomMightContain(col("s"), bloom))
      tr.join(evalNgramIndex(s, dir), Seq("s"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
          countDistinct(col("s")).as("n_shared_ngrams"))
        .orderBy("doc_id")
    })

  /** The memoized eval-split n-gram Bloom filter (1% fpp). Built with
    * the UTF-8-byte contract [[graft.functions.BloomMightContain]]
    * probes with; `treeAggregate` merges per-partition filters by
    * bit-OR, so the result is independent of row order and
    * partitioning. The eval split is small BY CONSTRUCTION (it is a
    * benchmark set), so the driver-held sketch is bounded the same way
    * the broadcast eval index already is. Package-visible so LlmOpsSpec
    * can probe fpp/selectivity directly. */
  private[graft] def decontamBloom(
      s: SparkSession, dir: String): org.apache.spark.util.sketch.BloomFilter =
    graft.SessionMemo.value(s, dir, "decontam_bloom") {
      val items = evalNgramIndex(s, dir).select(col("s")).distinct()
      val n = math.max(items.count(), 1L)
      items.as[String](org.apache.spark.sql.Encoders.STRING).rdd
        .treeAggregate(org.apache.spark.util.sketch.BloomFilter.create(n, 0.01))(
          (f, v) => { f.putBinary(v.getBytes(java.nio.charset.StandardCharsets.UTF_8)); f },
          (a, b) => { a.mergeInPlace(b); a })
    }

  // span length for cross-document exact-substring detection. Lee et al.
  // 2021 ("Deduplicating Training Data Makes Language Models Better")
  // use 50-token spans; 8 keeps the check meaningful on the short
  // synthetic docs (10-99 tokens) while exercising the identical plan.
  private[graft] val spanN = 8

  /** (doc_id, i, span_md5): every `spanN`-token window start (0-based)
    * with its span fingerprint — the shared scan both span queries
    * consume. Pure generator explode, no shuffle. */
  private def spanWindows(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) >= spanN)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(t) - $spanN)")).as("i"), col("t"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", expr(s"slice(t, i + 1, $spanN)"))).as("span_md5"))

  /** Cross-document repeated-span index — the exact-substring-dedup
    * primitive (Lee et al. 2021): every `spanN`-token window (step 1,
    * WITH multiplicity — unlike the distinct shingles near-dup uses)
    * that occurs in more than one document, keyed by its md5 so only a
    * 32-char fingerprint travels through the shuffle, never span text.
    * `first_doc` (min doc_id) is the canonical retention choice the cut
    * pass applies.
    *
    * 100 TB shape: one generator explode per doc (no shuffle), then a
    * single hash aggregation on the span fingerprint — partial map-side
    * aggregation bounds hot spans (a boilerplate phrase shared by half
    * the corpus still combines per task before the exchange). No
    * all-pairs stage exists at any scale. Filtered to n_docs > 1 BEFORE
    * persisting — the full window set is corpus-sized and must never be
    * pinned; the repeated subset is the boilerplate tail, orders of
    * magnitude smaller. Memoized per (session, dir): the index query and
    * the cut pass share one build; released by
    * [[graft.SessionMemo.clear]]. */
  private def repeatedSpanIndex(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "repeated_span_index") {
      spanWindows(s, dir)
        .groupBy(col("span_md5"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
    }

  private val e2RepeatedSpans = GraftQuery(
    "llm_e2_repeated_spans",
    s"cross-doc repeated $spanN-token spans, md5-keyed (exact-substring dedup, E2)",
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= $spanN),
      w AS (
        SELECT doc_id, md5(array_to_string(t[i:i+${spanN - 1}], ' ')) AS span_md5
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${spanN - 1})) AS i FROM t))
      SELECT span_md5,
             count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_occurrences,
             min(doc_id) AS first_doc
      FROM w
      GROUP BY span_md5
      HAVING count(DISTINCT doc_id) > 1
      ORDER BY span_md5"""),
    (s, dir) => repeatedSpanIndex(s, dir).orderBy("span_md5"))

  /** The cut pass that turns the span index into a deduplicated corpus
    * (the second half of Lee et al. 2021): for every document, excise
    * the token positions covered by a repeated span whose canonical
    * (first) document is someone else; the canonical document keeps its
    * text untouched. Fully-duplicated docs come out empty — the output
    * keeps one row per input doc with before/removed counts so the
    * dedup is auditable.
    *
    * 100 TB shape: windows join the (much smaller, but not assumed
    * broadcast-small) repeated index on the span fingerprint — a
    * key-partitioned shuffle AQE can downgrade to broadcast when the
    * index is tiny; covered positions stay (doc_id, pos) narrow; the
    * anti join and the rebuild group both shuffle on doc_id, the key
    * whose cardinality scales with the corpus. */
  private val e2SpanCut = GraftQuery(
    "llm_e2_span_cut",
    s"excise non-canonical repeated $spanN-token spans -> deduplicated corpus (E2)",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i, md5(array_to_string(t[i:i+${spanN - 1}], ' ')) AS span_md5
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${spanN - 1})) AS i FROM t
              WHERE len(t) >= $spanN)),
      idx AS (
        SELECT span_md5, min(doc_id) AS first_doc
        FROM w GROUP BY span_md5 HAVING count(DISTINCT doc_id) > 1),
      cov AS (
        SELECT DISTINCT doc_id, pos FROM (
          SELECT w.doc_id, unnest(generate_series(w.i, w.i + ${spanN - 1})) AS pos
          FROM w JOIN idx USING (span_md5)
          WHERE idx.first_doc <> w.doc_id)),
      tokpos AS (
        SELECT doc_id, i AS pos, t[i] AS tk
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM t)),
      kept AS (SELECT tp.* FROM tokpos tp ANTI JOIN cov USING (doc_id, pos)),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
               array_to_string(list(tk ORDER BY pos), ' ') AS cleaned_text
        FROM kept GROUP BY doc_id)
      SELECT t.doc_id,
             CAST(len(t.t) AS BIGINT) AS n_tokens,
             CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
             coalesce(a.cleaned_text, '') AS cleaned_text
      FROM t LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id"""),
    (s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), toks(col("text")).as("t"))
      val idx = repeatedSpanIndex(s, dir).select(col("span_md5"), col("first_doc"))
      val cov = spanWindows(s, dir)
        .join(idx, Seq("span_md5"))
        .filter(col("first_doc") =!= col("doc_id"))
        .select(col("doc_id"),
          explode(expr(s"sequence(i, i + ${spanN - 1})")).as("pos"))
        .distinct()
      val kept = tok
        .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tk")))
        .join(cov, Seq("doc_id", "pos"), "left_anti")
      val agg = kept.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", expr("transform(array_sort(collect_list(struct(pos, tk))), x -> x.tk)"))
            .as("cleaned_text"))
      tok.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"),
          coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
        .orderBy("doc_id")
    })

  /** Arbitrary-length repeated-substring report — the generalization of
    * [[e2RepeatedSpans]] from fixed-`spanN` windows to maximal repeated
    * REGIONS (Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better" semantics at the coverage level): per
    * document, the maximal contiguous runs of token positions covered
    * by any cross-document repeated `spanN`-window, each with its
    * arbitrary run length and the run's text. Two overlapping or
    * touching windows chain into one run (break when the next covered
    * start exceeds the previous by more than `spanN`), so a 40-token
    * boilerplate block shared by two docs comes out as ONE 40-token
    * span, not 33 separate 8-token rows — the shape the suffix-array
    * formulation reports, recovered here from the n-gram index the
    * engine already maintains (every substring of length L >= spanN
    * that repeats covers exactly its L - spanN + 1 window starts, all
    * repeated, all overlapping).
    *
    * 100 TB shape: windows join the repeated index on the span
    * fingerprint ([[e2SpanCut]]'s shape — key-partitioned, AQE
    * broadcasts a tiny index); the gaps-and-islands pass shuffles once
    * on doc_id with per-doc windows (bounded by document length, never
    * corpus-wide); the text re-attach is a doc_id-keyed join — BY KEY,
    * so a key-corrupted corpus fans out identically on both engines
    * (the simhash/semdedup discipline), and the final order includes
    * span_text to stay total under that fan-out. */
  private val e2LongRepeats = GraftQuery(
    "llm_e2_long_repeats",
    s"maximal repeated regions: merged runs of repeated $spanN-token windows (E2)",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      w AS (
        SELECT doc_id, i - 1 AS i0, md5(array_to_string(t[i:i+${spanN - 1}], ' ')) AS span_md5
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${spanN - 1})) AS i FROM t
              WHERE len(t) >= $spanN)),
      idx AS (
        SELECT span_md5 FROM w GROUP BY span_md5
        HAVING count(DISTINCT doc_id) > 1),
      cov AS (SELECT DISTINCT doc_id, i0 FROM w JOIN idx USING (span_md5)),
      brk AS (
        SELECT doc_id, i0,
               CASE WHEN lag(i0) OVER (PARTITION BY doc_id ORDER BY i0) IS NULL
                      OR i0 - lag(i0) OVER (PARTITION BY doc_id ORDER BY i0) > $spanN
                    THEN 1 ELSE 0 END AS b
        FROM cov),
      grp AS (
        SELECT doc_id, i0,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY i0
                            ROWS UNBOUNDED PRECEDING) AS run_id
        FROM brk),
      agg AS (
        SELECT doc_id,
               CAST(MIN(i0) AS BIGINT) AS start_pos,
               CAST(MAX(i0) - MIN(i0) + $spanN AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_windows
        FROM grp GROUP BY doc_id, run_id)
      SELECT a.doc_id, a.start_pos, a.n_tokens, a.n_windows,
             array_to_string(t.t[a.start_pos + 1 : a.start_pos + a.n_tokens], ' ')
               AS span_text
      FROM agg a JOIN t USING (doc_id)
      ORDER BY doc_id, start_pos, span_text"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cov = spanWindows(s, dir)
        .join(repeatedSpanIndex(s, dir).select(col("span_md5")), Seq("span_md5"))
        .select(col("doc_id"), col("i")).distinct()
      val ord = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val runs = cov
        .withColumn("b",
          when(lag(col("i"), 1).over(ord).isNull ||
            col("i") - lag(col("i"), 1).over(ord) > spanN, 1).otherwise(0))
        .withColumn("run_id", sum(col("b")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("run_id"))
        .agg(
          min(col("i")).cast("long").as("start_pos"),
          (max(col("i")) - min(col("i")) + spanN).cast("long").as("n_tokens"),
          count(lit(1)).as("n_windows"))
      runs
        .join(docs(s, dir).select(col("doc_id"), toks(col("text")).as("t")),
          Seq("doc_id"))
        .select(col("doc_id"), col("start_pos"), col("n_tokens"), col("n_windows"),
          concat_ws(" ", expr(
            "slice(t, cast(start_pos + 1 AS INT), cast(n_tokens AS INT))"))
            .as("span_text"))
        .orderBy(col("doc_id"), col("start_pos"), col("span_text"))
    })

  // ---------------------------------------------------------------------
  // E3: similarity search over embeddings
  // ---------------------------------------------------------------------

  /** embeddings with double-cast vector + L2 norm. Dot products via the
    * custom codegen'd [[graft.functions.DotProduct]] expression — same
    * sequential fold order as DuckDB's list_reduce, so sums stay
    * bit-identical across engines, ~100x faster than the interpreted
    * higher-order-function formulation. */
  private[llmops] def normed(s: SparkSession, dir: String): DataFrame = {
    val v = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    // non-indexable (null / non-finite) vectors already dropped by the
    // shared embeddings() read — see T.indexableEmbedding
    embeddings(s, dir)
      .select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
  }

  private def qvDot = graft.functions.VectorFunctions.dot(col("qv"), col("v"))

  /** The eval split of the embedding corpus (vec_id % 50 — the benchmark
    * construction; production passes the real eval/benchmark vectors),
    * guarded by the EXPLICIT broadcast contract the eval-NN and kNN
    * queries rely on: the eval side is BROADCAST so the training corpus
    * streams past it in one scan, which is only sound while the eval set
    * is fixed-size — real eval sets are (a benchmark does not grow with
    * the corpus), but the % 50 construction makes it 2% OF CORPUS, which
    * at true 100 TB scale would exceed executor broadcast capacity long
    * before any other part of the plan degrades. Rather than dying in
    * Spark's broadcast machinery with an opaque OOM, the split fails
    * fast here with the contract named: row count (memoized per
    * (session, dir) — one cheap count amortized across the family) must
    * stay within `graft.evalBroadcast.maxRows` (default 1,000,000 ≈
    * mid-hundreds of MB at O(100)-dim double vectors — the practical
    * per-executor broadcast ceiling). Raise the conf only if executors
    * genuinely hold it; shrink the eval set otherwise. Mirrors the
    * vector-indexability contract ([[graft.T.indexableEmbedding]]):
    * a documented data contract enforced in-plan. */
  private val evalSplitMaxRowsConf = "graft.evalBroadcast.maxRows"
  private def boundedEvalSplit(s: SparkSession, dir: String): DataFrame = {
    val maxRows =
      s.conf.getOption(evalSplitMaxRowsConf).map(_.toLong).getOrElse(1000000L)
    val rows = graft.SessionMemo.value(s, dir, "eval_split_rows") {
      embeddings(s, dir).filter(col("vec_id") % 50 === 0).count()
    }
    require(rows <= maxRows,
      s"eval split holds $rows vectors, beyond $evalSplitMaxRowsConf=$maxRows: " +
        "llm_e3_eval_nn / llm_e3_knn_classify broadcast the eval side by " +
        "contract (fixed-size eval/benchmark sets; the training corpus " +
        "streams). A corpus-proportional eval split eventually exceeds " +
        "executor broadcast capacity — pass a bounded eval set, or raise " +
        "the conf if your executors genuinely hold it.")
    normed(s, dir).filter(col("vec_id") % 50 === 0)
  }

  /** Tie-free 4-decimal quantization: with y = x·10⁴ + 0.5, emit
    * (y − (y % 1)) / 10⁴ — the same `q - (q % 1.0)` exact-truncation
    * discipline PageRank uses, spelled with the SAME double operations
    * in both engines, so the quantized value is bit-identical by
    * construction AND non-finite inputs propagate identically (fmod
    * maps NaN→NaN and ±Inf→NaN in both engines; a floor() spelling
    * would diverge — Spark's floor returns LONG, collapsing NaN to 0,
    * while DuckDB's keeps NaN). `round(x, 4)` is also out: Spark
    * rounds HALF_UP over the exact BigDecimal expansion of the double
    * while DuckDB rounds after a lossy float multiply, and a value
    * landing within an ulp of a .00005 boundary can flip in one engine
    * only (the repo's decimal-discipline rule; see README "Correctness
    * model"). Package-visible so every oracle-paired quantization site
    * (incl. BigramLm) goes through ONE definition. */
  private[llmops] def q4(c: Column): Column = graft.T.quantize(c, 10000.0)
  private[llmops] def q4Sql(e: String): String =
    graft.T.quantizeSql(e, "10000.0")

  /** ln(c) truncated toward zero onto an exact 1e-7 integer grid —
    * the summand for ORDER-INSENSITIVE logprob averaging: the
    * truncated values are integer-valued doubles (ln of any count ≤
    * ~44, so ≤ 4.4e8 ≪ 2^53), and integer-valued doubles below 2^53
    * sum EXACTLY in any order, in any partitioning, on any engine.
    * The per-doc mean then becomes a single division of exact
    * operands. This removes the avg(ln(...)) risk class entirely:
    * double summation is not associative, so a partitioning change
    * could shift the mean by an ulp and flip the q4 boundary in one
    * engine only. (The residual risk — Spark's Math.log and DuckDB's
    * libm disagreeing in the last ulp exactly where ln(n)·1e7 sits
    * within that ulp of an integer — is value-static, run-stable, and
    * ~1e-9 per distinct count.) */
  private[llmops] def ln7(c: Column): Column = {
    val y = log(c) * lit(1.0e7)
    y - (y % lit(1.0))
  }
  private[llmops] def ln7Sql(e: String): String =
    s"(ln($e) * 10000000.0 - ((ln($e) * 10000000.0) % 1.0))"

  /** Exact brute-force cosine top-5 for a fixed query set (vec_id < 10):
    * the query side is broadcast (it is small BY CONSTRUCTION — a search
    * has few queries), the corpus is scanned once; per-query ranking is a
    * bounded row_number window. Cosine is rounded to 4dp before ranking so
    * cross-engine ulp noise cannot flip ranks. */
  private val e3TopK = GraftQuery(
    "llm_e3_cosine_topk",
    "exact cosine top-5 per query vector, broadcast queries (E3)",
    Some(s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${graft.T.sqlIndexable}),
      n AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        FROM e),
      q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
      scored AS (
        SELECT q.q_id, c.vec_id AS neighbor_id,
               ${q4Sql("list_reduce(list_transform(list_zip(q.qv, c.v), p -> p[1] * p[2]), (a, b) -> a + b) / (q.qn * c.nrm)")} AS cosine
        FROM q CROSS JOIN n c
        WHERE c.vec_id <> q.q_id),
      ranked AS (
        SELECT q_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
        FROM scored)
      SELECT q_id, rn, neighbor_id, cosine
      FROM ranked WHERE rn <= 5
      ORDER BY q_id, rn"""),
    (s, dir) => {
      val n = normed(s, dir)
      val q = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      n.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine", q4(qvDot / (col("qn") * col("nrm"))))
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("q_id"), col("rn"), col("neighbor_id"), col("cosine"))
        .orderBy("q_id", "rn")
    })

  /** Semantic decontamination (E3 x E2): the top-1 eval-set neighbor for
    * every training vector — the embedding-space twin of the n-gram
    * decontamination pass (flag-or-drop thresholds are applied
    * downstream on the reported cosine). Eval split mirrors the n-gram
    * pass (vec_id % 50; production passes the real benchmark
    * embeddings, small by construction — the fixed-size broadcast
    * contract is enforced in-plan by [[boundedEvalSplit]]).
    *
    * 100 TB shape: broadcast the eval side, scan the corpus ONCE, and
    * take the per-train argmax as a map-side partial aggregate (max of
    * a (cosine, -eval_id) struct — lexicographic max = highest cosine,
    * ties to the lowest eval id). No window, so no sort of the scored
    * rows and no exchange before the partial agg; the only shuffle is
    * the final per-train combine. Cosines round to 4dp so FP ulps can't
    * flip the argmax between engines. */
  private val e3EvalNN = GraftQuery(
    "llm_e3_eval_nn",
    "semantic decontamination: top-1 eval-set neighbor per training vector (E3)",
    Some(s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${graft.T.sqlIndexable}),
      n AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        FROM e),
      ev AS (SELECT vec_id AS eval_id, v AS evv, nrm AS evn FROM n WHERE vec_id % 50 = 0),
      tr AS (SELECT vec_id AS train_id, v, nrm FROM n WHERE vec_id % 50 <> 0),
      scored AS (
        SELECT tr.train_id, ev.eval_id,
               ${q4Sql("list_reduce(list_transform(list_zip(tr.v, ev.evv), p -> p[1] * p[2]), (a, b) -> a + b) / (tr.nrm * ev.evn)")} AS cosine
        FROM tr CROSS JOIN ev),
      ranked AS (
        SELECT train_id, eval_id, cosine,
               row_number() OVER (PARTITION BY train_id
                                  ORDER BY cosine DESC, eval_id) AS rn
        FROM scored)
      SELECT train_id, eval_id AS nearest_eval_id, cosine
      FROM ranked WHERE rn = 1
      ORDER BY train_id"""),
    (s, dir) => {
      val n = normed(s, dir)
      val ev = boundedEvalSplit(s, dir)
        .select(col("vec_id").as("eval_id"), col("v").as("evv"), col("nrm").as("evn"))
      val tr = n.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("train_id"), col("v"), col("nrm"))
      tr.crossJoin(broadcast(ev))
        .withColumn("cosine",
          q4(graft.functions.VectorFunctions.dot(col("v"), col("evv"))
            / (col("nrm") * col("evn"))))
        .groupBy(col("train_id"))
        .agg(max(struct(col("cosine"), (-col("eval_id")).as("neg_eval"),
          col("eval_id"))).as("best"))
        .select(col("train_id"), col("best.eval_id").as("nearest_eval_id"),
          col("best.cosine").as("cosine"))
        .orderBy("train_id")
    })

  /** k-NN label classification (E3): each eval vector (vec_id % 50 == 0)
    * predicted as the majority label of its 5 nearest training vectors
    * by cosine — the label-propagation / weak-annotation pass an
    * embedding pipeline runs to score a labeling model, with the
    * per-query accuracy bit in the output.
    *
    * 100 TB shape: the eval side broadcasts (2% by construction; real
    * eval sets are small), the training corpus scans ONCE, and the
    * per-eval top-5 comes from the k-bounded [[graft.functions.TopKAgg]]
    * — partial aggregation ships ≤ 5 rows per eval per map partition
    * instead of window-sorting the |train|×|eval| scored rows. Labels
    * re-attach to the 5·|eval| shortlist only (the shortlist side
    * broadcasts), and the vote argmax is a lexicographic struct max —
    * map-side combinable, no window. Cosines round to 4dp so FP ulps
    * cannot flip ranks between engines; vote ties break to the smaller
    * label. */
  private val e3KnnClassify = GraftQuery(
    "llm_e3_knn_classify",
    "k-NN majority-label classification of the eval split, k=5 via TopKAgg (E3)",
    Some(s"""
      WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${graft.T.sqlIndexable}),
      n AS (
        SELECT vec_id, label, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        FROM e),
      ev AS (SELECT vec_id AS eval_id, label AS true_label, v AS evv, nrm AS evn
             FROM n WHERE vec_id % 50 = 0),
      tr AS (SELECT vec_id AS train_id, label, v, nrm FROM n WHERE vec_id % 50 <> 0),
      scored AS (
        SELECT ev.eval_id, ev.true_label, tr.train_id, tr.label,
               ${q4Sql("list_reduce(list_transform(list_zip(ev.evv, tr.v), p -> p[1] * p[2]), (a, b) -> a + b) / (ev.evn * tr.nrm)")} AS cosine
        FROM ev CROSS JOIN tr),
      top5 AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY eval_id
                                       ORDER BY cosine DESC, train_id) AS rn
          FROM scored) WHERE rn <= 5),
      votes AS (
        SELECT eval_id, true_label, label, COUNT(*) AS v
        FROM top5 GROUP BY eval_id, true_label, label),
      pick AS (
        SELECT *, row_number() OVER (PARTITION BY eval_id ORDER BY v DESC, label) AS pr
        FROM votes)
      SELECT eval_id, true_label, label AS predicted_label,
             CAST(v AS BIGINT) AS n_votes,
             label = true_label AS correct
      FROM pick WHERE pr = 1
      ORDER BY eval_id"""),
    (s, dir) => {
      // the label MAP must be key-unique: both joins below rely on
      // ×1 fan-out to preserve shortlist multiplicity — a duplicate-KEY
      // embeddings row (tenth axis, round 15) would otherwise double
      // every vote. distinct's partial agg dedupes map-side; the
      // exchange moves (id, label) pairs only.
      val labels = embeddings(s, dir).select(col("vec_id"), col("label")).distinct()
      val n = normed(s, dir)
      val ev = boundedEvalSplit(s, dir)
        .join(labels.toDF("vec_id", "true_label"), "vec_id")
        .select(col("vec_id").as("eval_id"), col("true_label"),
          col("v").as("evv"), col("nrm").as("evn"))
      val tr = n.filter(col("vec_id") % 50 =!= 0)
        .select(col("vec_id").as("train_id"), col("v"), col("nrm"))
      val topk = graft.functions.TopKAgg.udaf(5)
      val top5 = tr.crossJoin(broadcast(ev))
        .withColumn("cosine",
          q4(graft.functions.VectorFunctions.dot(col("evv"), col("v"))
            / (col("evn") * col("nrm"))))
        .groupBy(col("eval_id"), col("true_label"))
        .agg(topk(col("cosine"), col("train_id")).as("top"))
        .select(col("eval_id"), col("true_label"),
          explode(col("top")).as("item"))
        .select(col("eval_id"), col("true_label"), col("item.id").as("train_id"))
      // labels re-attach to the bounded shortlist: broadcast the 5·|eval|
      // rows against the train-sized label scan, never the reverse
      labels.toDF("train_id", "label")
        .join(broadcast(top5), "train_id")
        .groupBy(col("eval_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("v"))
        .groupBy(col("eval_id"), col("true_label"))
        .agg(max(struct(col("v"), (-col("label")).cast("int").as("neg"),
          col("label"))).as("best"))
        .select(col("eval_id"), col("true_label"),
          col("best.label").as("predicted_label"),
          col("best.v").as("n_votes"),
          (col("best.label") === col("true_label")).as("correct"))
        .orderBy("eval_id")
    })

  /** Per-label mean embedding — the class-prototype build (nearest-
    * centroid classifiers, clustering seeds, drift monitoring). Output
    * is dim-exploded (label, dim, centroid) so the oracle compares
    * scalar-by-scalar.
    *
    * Components quantize to 1e-7 by TRUNCATION toward zero before
    * summing: truncating a double has no rounding ties, so the integer
    * quantities (and therefore the sums, in any order) are bit-identical
    * across engines. Decimal CASTS of full-precision doubles are NOT —
    * Spark rounds the shortest string rendering of the double where
    * DuckDB rounds the exact binary value, and at scale 10 the two
    * disagree about once per few thousand embedding floats (measured).
    * The ≤1e-7 per-component quantization is noise for prototype use —
    * and an int8-quantizing pipeline (llm_e3_quantize_audit) truncates
    * far harder.
    *
    * 100 TB shape: one generator explode (×dims, no shuffle) feeding a
    * single partial/final aggregate on (label, dim) — |labels|·|dims|
    * groups regardless of corpus size, map-side combined; BIGINT sums
    * never overflow (|x|·1e7 ≤ 1e8 per component). */
  private val e3Centroids = GraftQuery(
    "llm_e3_label_centroids",
    "per-label mean embedding (class prototypes), 1e-7-quantized exact means (E3)",
    Some(s"""
      WITH e AS (
        SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${graft.T.sqlIndexable}),
      d AS (
        SELECT label, CAST(i AS BIGINT) AS dim,
               CAST(trunc(v[i] * 10000000.0) AS BIGINT) AS q
        FROM (SELECT label, v, unnest(generate_series(1, len(v))) AS i FROM e))
      SELECT label, dim,
             COUNT(*) AS n_vecs,
             CAST(CAST((SUM(q)) AS VARCHAR) AS DOUBLE) / (10000000.0 * COUNT(*)) AS centroid
      FROM d GROUP BY label, dim
      ORDER BY label, dim"""),
    (s, dir) => {
      embeddings(s, dir)
        .select(col("label"),
          posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
            .as(Seq("pos", "x")))
        // double->long cast truncates toward zero, matching trunc()
        .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
          (col("x") * 10000000.0).cast("long").as("q"))
        .groupBy(col("label"), col("dim"))
        .agg(
          count(lit(1)).as("n_vecs"),
          (sum(col("q")).cast("double") / (lit(10000000.0) * count(lit(1))))
            .as("centroid"))
        .orderBy("label", "dim")
    })

  // Multi-table hyperplane LSH: L independent tables of b sign bits each.
  // Recall for a pair at angle θ is 1-(1-(1-θ/π)^b)^L — one table of many
  // planes has near-zero recall on mid-cosine neighbors (the testdata's
  // true top-1s sit at cosine ~0.35), so production ANN uses several
  // coarser tables and unions their candidates. Expected within-bucket
  // pair count per table is ~n²/2^(b+1): b controls the quadratic blowup,
  // L buys recall back linearly — the all-pairs query needs fine buckets
  // (8 bits), the 10-query search can afford coarse ones (4 bits).
  private val annTables = 8
  private val annBits = 4
  private val pairTables = 12
  private val pairBits = 8

  /** Deterministic random hyperplanes (fixed seed per table) as literal
    * columns — computed once on the driver, shipped in the plan for free. */
  private[graft] def hyperplanes(dim: Int, table: Int, bits: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42 + table)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The LSH pipeline as generated ANSI SQL. The hyperplanes are plan
    * literals on the Spark side, so the oracle embeds the SAME doubles
    * as SQL literals (Double.toString round-trips exactly; DuckDB
    * parses to the identical binary64). The dot products fold
    * sequentially in both engines (list_reduce == the codegen'd
    * [[graft.functions.DotProduct]]/[[graft.functions.LshBuckets]]
    * loop), so every sign bit — and therefore every bucket id and the
    * candidate pair set — is bit-deterministic and engine-neutral.
    * ~20 KB of SQL per table of planes; generated, never hand-edited. */
  private[llmops] def sqlDot(vExpr: String, w: Array[Double]): String = {
    val arr = w.map(java.lang.Double.toString).mkString("[", ", ", "]")
    s"list_reduce(list_transform(list_zip($vExpr, $arr), p -> p[1] * p[2]), (a, b) -> a + b)"
  }
  private def sqlBuckets(tables: Int, bits: Int): String = {
    val planes = (0 until tables).flatMap(t => hyperplanes(64, t, bits))
    (0 until tables).map { t =>
      val bucket = (0 until bits).map { b =>
        s"(CASE WHEN ${sqlDot("v", planes(t * bits + b))} > 0 THEN ${1 << b} ELSE 0 END)"
      }.mkString("\n               + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM n"
    }.mkString("\n        UNION ALL ")
  }
  /** Sequential-fold dot of two vector COLUMNS in SQL (the literal-free
    * twin of [[sqlDot]]) — same fold order as the codegen'd DotProduct. */
  private[llmops] def sqlDotCols(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (a, b) -> a + b)"

  private[llmops] val sqlNormedCte = s"""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE ${graft.T.sqlIndexable}),
      n AS (
        SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        FROM e)"""

  /** (vec_id, v, nrm, tbl, bucket) — one row per vector per LSH table.
    * All tables' buckets come out of ONE codegen'd pass over the vector
    * ([[graft.functions.LshBuckets]]) and fan out via posexplode. */
  private def lshBucketed(s: SparkSession, dir: String,
      tables: Int, bits: Int): DataFrame = {
    val planes = (0 until tables).flatMap(t => hyperplanes(64, t, bits))
    normed(s, dir)
      .select(col("vec_id"), col("v"), col("nrm"),
        posexplode(graft.functions.VectorFunctions.lshBuckets(col("v"), planes, tables, bits))
          .as(Seq("tbl", "bucket")))
  }

  /** ANN via multi-table random-hyperplane LSH (the scale path for E3):
    * per table, b sign bits -> bucket id; candidates = same-(table,bucket)
    * vectors unioned over tables; exact cosine + top-3 within candidates.
    * The shuffle key is (table, bucket) regardless of corpus size —
    * candidate count per query is L x bucket-occupancy, never the corpus.
    * ORACLE-PAIRED since round 8: the hyperplanes ride into the SQL as
    * the same literals the plan carries ([[sqlBuckets]]), so the bucket
    * ids, candidate set, and rounded cosines are engine-neutral; recall
    * vs the exact top-k stays independently asserted in LlmOpsSpec. */
  private val e3Ann = GraftQuery(
    "llm_e3_ann_lsh_topk",
    "multi-table random-hyperplane LSH ANN top-3 (E3)",
    Some(s"""$sqlNormedCte,
      bk AS (
        ${sqlBuckets(annTables, annBits)}),
      q AS (SELECT vec_id AS q_id, tbl AS qtbl, bucket AS qb FROM bk WHERE vec_id < 10),
      cand AS (
        SELECT DISTINCT q.q_id, c.vec_id AS neighbor_id
        FROM bk c JOIN q ON c.tbl = q.qtbl AND c.bucket = q.qb AND c.vec_id <> q.q_id),
      scored AS (
        SELECT cd.q_id, cd.neighbor_id,
               ${q4Sql(sqlDotCols("nq.v", "nc.v") + " / (nq.nrm * nc.nrm)")} AS cosine
        FROM cand cd
        JOIN n nq ON cd.q_id = nq.vec_id
        JOIN n nc ON cd.neighbor_id = nc.vec_id),
      ranked AS (
        SELECT q_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
        FROM scored)
      SELECT q_id, rn, neighbor_id, cosine
      FROM ranked WHERE rn <= 3
      ORDER BY q_id, rn"""),
    (s, dir) => {
      val bucketed = lshBucketed(s, dir, annTables, annBits)
      val q = bucketed.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          col("tbl").as("qtbl"), col("bucket").as("qb"))
      // candidate ids stay narrow through the bucket join + dedup;
      // vectors re-attach for the scoring pass only
      val cand = bucketed.select(col("vec_id"), col("tbl"), col("bucket"))
        .join(broadcast(q),
          col("tbl") === col("qtbl") && col("bucket") === col("qb") &&
            col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
        .distinct()
      val n = normed(s, dir)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      cand
        .join(broadcast(n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))), "q_id")
        .join(n.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), "neighbor_id")
        .withColumn("cosine", q4(qvDot / (col("qn") * col("nrm"))))
        .select(col("q_id"), col("neighbor_id"), col("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("neighbor_id"), col("cosine"))
        .orderBy("q_id", "rn")
    })

  /** Embedding-cosine near-dup PAIRS (the fifth dedup family): docs whose
    * embeddings sit above a cosine threshold. Candidates from the same
    * multi-table hyperplane LSH as the ANN search (shuffle key =
    * (table, bucket), never all-pairs); exact cosine verifies each
    * candidate. ORACLE-PAIRED since round 8 via literal-embedded
    * hyperplanes ([[sqlBuckets]]); LlmOpsSpec keeps the independent
    * brute-force cross-check at sf0.001. */
  private val e2EmbedCosine = GraftQuery(
    "llm_e2_embed_cosine_pairs",
    "multi-table LSH candidates + exact cosine >= 0.4 near-dup pairs (E2)",
    Some(s"""$sqlNormedCte,
      bk AS (
        ${sqlBuckets(pairTables, pairBits)}),
      cand AS (
        SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
        FROM bk a JOIN bk b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      scored AS (
        SELECT c.da, c.db,
               ${q4Sql(sqlDotCols("na.v", "nb.v") + " / (na.nrm * nb.nrm)")} AS cosine
        FROM cand c
        JOIN n na ON c.da = na.vec_id
        JOIN n nb ON c.db = nb.vec_id)
      SELECT da, db, cosine FROM scored
      WHERE cosine >= 0.4
      ORDER BY da, db"""),
    (s, dir) => {
      // candidate ids stay NARROW through the bucket join + dedup (no
      // 64-dim arrays in the shuffle); vectors re-attach only for the
      // surviving pairs
      val bucketed = lshBucketed(s, dir, pairTables, pairBits)
        .select(col("vec_id"), col("tbl"), col("bucket"))
      val cand = bucketed.as("a")
        .join(bucketed.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("da"), col("b.vec_id").as("db"))
        .distinct()
      val n = normed(s, dir)
      cand
        .join(n.select(col("vec_id").as("da"), col("v").as("qv"), col("nrm").as("qn")), "da")
        .join(n.select(col("vec_id").as("db"), col("v"), col("nrm")), "db")
        .withColumn("cosine", q4(qvDot / (col("qn") * col("nrm"))))
        .filter(col("cosine") >= 0.4)
        .select(col("da"), col("db"), col("cosine"))
        .orderBy("da", "db")
    })

  /** The IVF per-row distance candidates — `{d2, cell}` structs over the
    * centroid literals — in both spellings. The Spark struct array and
    * the DuckDB struct list compare identically (lexicographic by field
    * order: d2 first, cell as the tiebreak), the dot products fold
    * sequentially in both engines, and the ||c||² constant is computed
    * ONCE on the driver and embedded as the same binary64 literal on
    * both sides — so argmin cell assignment and probe ranking are
    * engine-neutral bit-for-bit. The +||v||² constant is dropped from
    * d2: the argmin is invariant to it, and keeping it would cost K
    * redundant 64-dim self-dots per corpus row. */
  private[llmops] def ivfCellStructs(cs: Array[Array[Double]], vcol: Column): Seq[Column] =
    cs.toSeq.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(-2.0) * graft.functions.VectorFunctions.dot(vcol, array(c.map(lit): _*))
          + lit(c.map(x => x * x).sum)).as("d2"),
        lit(i).as("cell"))
    }
  private[llmops] def ivfCellStructsSql(cs: Array[Array[Double]]): String =
    cs.zipWithIndex.map { case (c, i) =>
      val sumsq = java.lang.Double.toString(c.map(x => x * x).sum)
      s"{'d2': -2.0 * ${sqlDot("v", c)} + $sumsq, 'cell': $i}"
    }.mkString("[", ",\n          ", "]")

  /** The IVF pipeline as generated ANSI SQL (the data-dependent twin of
    * [[sqlBuckets]]): the centroids are deterministic per-dir constants
    * (seeded sample, vec_id-sorted, local Lloyd — memoized in
    * [[ProductQuant.ivfCentroids]]), so the oracle embeds the SAME
    * doubles the Spark plan carries. Generated at verify time via
    * [[GraftQuery.oracleGen]], never hand-edited. */
  private def ivfOracleSql(s: SparkSession, dir: String): String = {
    val structs = ivfCellStructsSql(ProductQuant.ivfCentroids(s, dir))
    s"""$sqlNormedCte,
      asgn AS (
        SELECT vec_id, list_min($structs).cell AS cell FROM n),
      qp AS (
        SELECT vec_id AS q_id,
               unnest(list_transform(list_sort($structs)[1:${ProductQuant.ivfProbes}],
                                     x -> x.cell)) AS cell
        FROM n WHERE vec_id < 10),
      cand AS (
        SELECT DISTINCT qp.q_id, a.vec_id AS neighbor_id
        FROM asgn a JOIN qp ON a.cell = qp.cell AND a.vec_id <> qp.q_id),
      scored AS (
        SELECT cd.q_id, cd.neighbor_id,
               ${q4Sql(sqlDotCols("nq.v", "nc.v") + " / (nq.nrm * nc.nrm)")} AS cosine
        FROM cand cd
        JOIN n nq ON cd.q_id = nq.vec_id
        JOIN n nc ON cd.neighbor_id = nc.vec_id),
      ranked AS (
        SELECT q_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
        FROM scored)
      SELECT q_id, rn, neighbor_id, cosine
      FROM ranked WHERE rn <= 3
      ORDER BY q_id, rn"""
  }

  /** ANN via IVF (inverted-file index — the other scale path the north
    * star names alongside LSH): a k-means coarse quantizer assigns every
    * vector to its nearest centroid cell; each query probes only its
    * `ivfProbes` nearest cells and scores those candidates exactly.
    * Corpus scan cost per query drops to probes/cells of the data;
    * centroids are a driver-side constant (k x 64 doubles) shipped into
    * the plan, so cell assignment is a codegen'd projection, and the
    * candidate join shuffles on the cell id. The quantizer is the SAME
    * memoized seeded local-Lloyd fit the IVF-PQ index uses
    * ([[ProductQuant.ivfCentroids]] — one fit, one bounded sample scan,
    * two consumers). ORACLE-PAIRED since round 9 via generated SQL
    * embedding the centroid literals ([[ivfOracleSql]]); recall vs the
    * exact top-k stays independently asserted in LlmOpsSpec. */
  private val e3Ivf = GraftQuery(
    "llm_e3_ivf_topk",
    "IVF: k-means cells + nprobe cell-scan ANN top-3 (E3)",
    None,
    (s, dir) => {
      val n = normed(s, dir)
      val centroids = ProductQuant.ivfCentroids(s, dir)
      val cells = n.withColumn("cell",
        array_min(array(ivfCellStructs(centroids, col("v")): _*)).getField("cell"))
      // each query probes its `ivfProbes` nearest cells
      val qCells = n.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv_full"))
        .withColumn("probe_cells",
          slice(transform(array_sort(array(ivfCellStructs(centroids, col("qv_full")): _*)),
            x => x.getField("cell")), 1, ProductQuant.ivfProbes))
        .select(col("q_id"), explode(col("probe_cells")).as("cell"))
      val cand = cells.select(col("vec_id"), col("cell"))
        .join(broadcast(qCells), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"))
        .distinct()
      val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      cand
        .join(broadcast(n.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))), "q_id")
        .join(n.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")), "neighbor_id")
        .withColumn("cosine", q4(qvDot / (col("qn") * col("nrm"))))
        .select(col("q_id"), col("neighbor_id"), col("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("q_id"), col("rn"), col("neighbor_id"), col("cosine"))
        .orderBy("q_id", "rn")
    },
    oracleGen = Some(ivfOracleSql))

  // ---------------------------------------------------------------------
  // E4: text analysis
  // ---------------------------------------------------------------------

  /** Term frequencies: the classic explode + group-count. Partial
    * aggregation makes this one small shuffle of (term, count) pairs. */
  private val e4Terms = GraftQuery(
    "llm_e4_term_frequencies",
    "tokenize + explode + group-count term frequencies (E4)",
    Some("""
      SELECT tok AS term, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
      ORDER BY freq DESC, term"""),
    (s, dir) =>
      docs(s, dir)
        .select(explode(toks(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")))

  private val stopwords = Seq("the", "a")

  /** Per-document quality metrics: token counts (whitespace + a BPE-ish
    * regex token count), distinct ratio, stopword ratio, punctuation
    * count, and a boolean quality gate — the usual pre-training corpus
    * filters. All single-division doubles (exact operands), so
    * cross-engine hashes match without rounding. */
  private val e4Quality = GraftQuery(
    "llm_e4_doc_quality",
    "per-doc quality stats: token/distinct/stopword/punct metrics (E4)",
    Some(s"""
      WITH q AS (
        SELECT doc_id, lang, n_chars,
               string_split(text, ' ') AS t,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpeish,
               length(text) - length(replace(replace(text, ',', ''), '.', '')) AS n_punct
        FROM documents)
      SELECT doc_id, lang, n_chars,
             len(t) AS n_tokens,
             n_bpeish,
             len(list_distinct(t)) AS n_distinct,
             len(list_filter(t, x -> x IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS n_stop,
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
             CAST(len(list_filter(t, x -> x IN (${stopwords.map(w => s"'$w'").mkString(", ")}))) AS DOUBLE) / len(t) AS stop_ratio,
             n_punct,
             (len(t) >= 20 AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.15) AS quality_ok
      FROM q
      ORDER BY doc_id"""),
    (s, dir) => {
      val stopPred = stopwords.map(w => s"x = '$w'").mkString(" OR ")
      docs(s, dir)
        .withColumn("t", toks(col("text")))
        .withColumn("n_tokens", size(col("t")))
        .withColumn("n_bpeish",
          size(expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)")))
        .withColumn("n_distinct", size(array_distinct(col("t"))))
        .withColumn("n_stop", size(expr(s"filter(t, x -> $stopPred)")))
        .withColumn("n_punct",
          length(col("text")) - length(regexp_replace(col("text"), "[,.]", "")))
        .select(
          col("doc_id"), col("lang"), col("n_chars"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_bpeish").cast("long").as("n_bpeish"),
          col("n_distinct").cast("long").as("n_distinct"),
          col("n_stop").cast("long").as("n_stop"),
          (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_ratio"),
          (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
          col("n_punct").cast("long").as("n_punct"),
          (col("n_tokens") >= 20 &&
            col("n_distinct").cast("double") / col("n_tokens") >= 0.15).as("quality_ok"))
        .orderBy("doc_id")
    })

  /** Language ID, n-gram-heuristic style: score = stopword-token hit rate
    * against a (deliberately tiny) per-language profile. The synthetic
    * corpus shares one English-ish vocabulary across langs, so the honest
    * output of any content-based LID here is 'en'/'und' — the point is the
    * operator shape (profile scoring + argmax), not the model. */
  private val e4LangId = GraftQuery(
    "llm_e4_language_id",
    "heuristic stopword-profile language ID vs labeled lang (E4)",
    Some("""
      WITH scored AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS en_score
        FROM documents)
      SELECT lang,
             CASE WHEN en_score > 0 THEN 'en' ELSE 'und' END AS predicted,
             count(*) AS n_docs
      FROM scored
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) =>
      docs(s, dir)
        .withColumn("t", toks(col("text")))
        .withColumn("en_score",
          size(expr("filter(t, x -> x = 'the' OR x = 'a')")).cast("double") / size(col("t")))
        .withColumn("predicted", when(col("en_score") > 0, "en").otherwise("und"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted"))

  /** Document fingerprints: exact content hash (md5) + order-insensitive
    * bag-of-words hash — the two standard dedup keys (exact and
    * shuffled-content). */
  private val e4Fingerprint = GraftQuery(
    "llm_e4_fingerprints",
    "content md5 + sorted-bag md5 fingerprints (E4)",
    Some("""
      SELECT doc_id,
             md5(text) AS content_fp,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp
      FROM documents
      ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(col("text")).as("content_fp"),
          md5(array_join(array_sort(array_distinct(toks(col("text")))), " ")).as("bag_fp"))
        .orderBy("doc_id"))

  /** Rolling-hash fingerprint (winnowing/MOSS-style): polynomial rolling
    * hash over every 16-char window (h = fold (h*257 + c) mod 1e9+7 —
    * identical fold on both engines), fingerprint = min window hash, plus
    * distinct-window cardinality. The min-hash-of-windows survives small
    * edits anywhere except the minimal window — the standard
    * shift-robust near-dup key that content hashes (md5) cannot give. */
  private val e4Rolling = GraftQuery(
    "llm_e4_rolling_fingerprint",
    "polynomial rolling-hash 16-char windows, winnowed min fingerprint (E4)",
    Some("""
      WITH w AS (
        SELECT doc_id,
          list_transform(generate_series(1, length(text) - 15), i ->
            list_reduce(
              list_transform(generate_series(0, 15),
                j -> CAST(ord(substr(text, CAST(i + j AS INT), 1)) AS BIGINT)),
              (h, c) -> (h * 257 + c) % 1000000007)) AS ws
        FROM documents
        WHERE length(text) >= 16)
      SELECT doc_id,
        list_min(ws) AS min_window_hash,
        CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_windows
      FROM w
      ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .filter(length(col("text")) >= 16)
        // codegen'd single-pass rolling recurrence (RollingHashes) — the
        // HOF window-by-window fold is O(len*16) with O(pos) substring
        // seeks and measured 57s at sf0.1
        .withColumn("ws",
          graft.functions.TextFunctions.rollingHashes(col("text"), 16, 257L, 1000000007L))
        .select(col("doc_id"),
          array_min(col("ws")).as("min_window_hash"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct_windows"))
        .orderBy("doc_id"))

  /** Within-document repetition: duplicate bigram/trigram fractions —
    * the Gopher-style repetition filters (high duplicate-n-gram fraction
    * marks boilerplate/spam that per-token quality stats miss). Pure
    * per-row projection: no shuffle at all until the deterministic output
    * sort, so it composes with any scan at any scale. Ratios are single
    * divisions of exact integer operands, identical formula shape on both
    * engines, so hashes match bit-for-bit. */
  private val e4Repetition = GraftQuery(
    "llm_e4_repetition_ratio",
    "duplicate bigram/trigram fractions per doc, Gopher-style repetition filter (E4)",
    Some("""
      WITH g AS (
        SELECT doc_id,
               len(t) - 1 AS n_bigrams,
               len(list_distinct(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1]))) AS n_distinct_bigrams,
               len(t) - 2 AS n_trigrams,
               len(list_distinct(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS n_distinct_trigrams
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents
              WHERE len(string_split(text, ' ')) >= 3))
      SELECT doc_id, n_bigrams, n_distinct_bigrams,
             1 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams AS dup_bigram_ratio,
             n_trigrams, n_distinct_trigrams,
             1 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams AS dup_trigram_ratio,
             (1 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams) <= 0.2 AS repetition_ok
      FROM g
      ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .withColumn("t", toks(col("text")))
        .filter(size(col("t")) >= 3)
        .withColumn("n_bigrams", (size(col("t")) - 1).cast("long"))
        .withColumn("n_distinct_bigrams",
          size(expr(ngramExpr(2))).cast("long"))
        .withColumn("n_trigrams", (size(col("t")) - 2).cast("long"))
        .withColumn("n_distinct_trigrams",
          size(expr(ngramExpr(3))).cast("long"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
          (lit(1) - col("n_distinct_bigrams").cast("double") / col("n_bigrams"))
            .as("dup_bigram_ratio"),
          col("n_trigrams"), col("n_distinct_trigrams"),
          (lit(1) - col("n_distinct_trigrams").cast("double") / col("n_trigrams"))
            .as("dup_trigram_ratio"),
          ((lit(1) - col("n_distinct_bigrams").cast("double") / col("n_bigrams")) <= 0.2)
            .as("repetition_ok"))
        .orderBy("doc_id"))

  // RAG/context-prep chunking: 32-token windows every 24 tokens (8-token
  // overlap). Sized to the synthetic docs (10-99 tokens, avg 54) so most
  // docs produce 2-4 overlapping chunks; production scales both knobs.
  private val chunkSize = 32
  private val chunkStride = 24

  /** Overlapping token-window chunking — the context-preparation op every
    * RAG / long-context training pipeline runs before embedding or
    * packing. One generator explode per doc (no shuffle until the
    * deterministic output sort); chunks are fingerprinted (md5) instead
    * of materializing chunk text through the shuffle, the narrow-row
    * discipline that matters when the corpus is 100 TB. Window starts
    * step by `chunkStride`; the trailing chunk may be short (both engines
    * clamp the slice identically). */
  private val e4Chunk = GraftQuery(
    "llm_e4_chunk_windows",
    s"overlapping $chunkSize/$chunkStride token-window chunking + chunk fingerprints (E4)",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      c AS (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, $chunkStride)) AS start
            FROM t)
      SELECT doc_id,
             CAST(start // $chunkStride AS BIGINT) AS chunk_idx,
             CAST(start AS BIGINT) AS start_tok,
             CAST(len(t[start + 1 : start + $chunkSize]) AS BIGINT) AS n_chunk_toks,
             md5(array_to_string(t[start + 1 : start + $chunkSize], ' ')) AS chunk_md5
      FROM c
      ORDER BY doc_id, chunk_idx"""),
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("t"),
          explode(expr(s"sequence(0, size(t) - 1, $chunkStride)")).as("start"))
        .select(col("doc_id"),
          floor(col("start") / chunkStride).cast("long").as("chunk_idx"),
          col("start").cast("long").as("start_tok"),
          size(expr(s"slice(t, start + 1, $chunkSize)")).cast("long").as("n_chunk_toks"),
          md5(concat_ws(" ", expr(s"slice(t, start + 1, $chunkSize)"))).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx"))

  /** Corpus unigram-LM surprisal — the perplexity-style quality-filter
    * shape (CCNet scores docs with a KenLM; a unigram LM built from the
    * corpus itself is the exactly-computable analog with the same plan):
    * avg_neg_logprob = ln(N) - mean(ln(count(token))), higher = more
    * surprising under the corpus distribution. Computed ORDER-
    * INSENSITIVELY on both engines: each ln lands on the exact 1e-7
    * integer grid ([[ln7]]), per-doc sums of those integer-valued
    * doubles are exact in any order/partitioning, and the mean is ONE
    * division of exact operands — (t7·k − Σln7) / (k·1e7) with t7·k ≤
    * ~4e12 ≪ 2^53 — so the q4'd output cannot drift by summation
    * order (avg(ln(...)) could: double addition is not associative).
    *
    * 100 TB shape: the term-frequency table is vocabulary-sized —
    * bounded, NOT corpus-sized — so it broadcasts (the same reasoning
    * that lets CCNet ship its LM to every worker); the corpus-sized
    * token stream joins it map-side with zero shuffle, and the per-doc
    * agg shuffles on doc_id. The grand total is a 1-row broadcast. */
  private val e4Surprisal = GraftQuery(
    "llm_e4_unigram_logprob",
    "corpus unigram-LM surprisal scoring, broadcast TF table (E4)",
    Some(s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
      tf AS (SELECT tk, count(*) AS n FROM tok GROUP BY tk),
      tot AS (SELECT sum(n) AS total FROM tf)
      SELECT doc_id,
             count(*) AS n_toks,
             ${q4Sql(s"(${ln7Sql("tot.total")} * count(*) - sum(${ln7Sql("tf.n")}))" +
                " / (count(*) * 10000000.0)")} AS avg_neg_logprob
      FROM tok JOIN tf USING (tk) CROSS JOIN tot
      GROUP BY doc_id, tot.total
      ORDER BY doc_id"""),
    (s, dir) => {
      val tok = docs(s, dir).select(col("doc_id"), explode(toks(col("text"))).as("tk"))
      // the TF table is vocabulary-bounded but COSTS a full corpus
      // explode+agg — memoize it so the broadcast branch and the total
      // don't re-run that scan (released by SessionMemo.clear)
      val tf = graft.SessionMemo.materialized(s, dir, "unigram_tf") {
        tok.groupBy(col("tk")).agg(count(lit(1)).as("n"))
      }
      val tot = tf.agg(sum(col("n")).as("total"))
      tok.join(broadcast(tf), Seq("tk"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(ln7(col("n"))).as("sum7"))
        .crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_toks"),
          q4((ln7(col("total")) * col("n_toks") - col("sum7"))
            / (col("n_toks") * lit(1.0e7))).as("avg_neg_logprob"))
        .orderBy("doc_id")
    })

  // demo mask lexicon — two words the synthetic vocabulary actually
  // contains, so the oracle compare is non-vacuous at every SF;
  // production passes the real blocklist (names, secrets, slurs)
  private val scrubLexicon = Seq("customer", "spark")
  // the oracle's IN-list form of the lexicon — interpolated (with SQL
  // quote escaping, so apostrophe-bearing blocklist words survive) so
  // editing scrubLexicon cannot desynchronize the two engines
  private val scrubLexiconSql =
    scrubLexicon.map(w => s"'${w.replace("'", "''")}'").mkString(", ")
  private val scrubEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val scrubIpv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Lexicon + pattern scrubbing — the PII-redaction plan shape every
    * pre-training pipeline runs: mask blocklisted terms token-by-token,
    * then redact structured classes (email, IPv4) by regex. The lexicon
    * is compiled into the plan as a literal (the broadcast analog for a
    * small dict; a production-sized dictionary becomes a broadcast join
    * on the exploded token, or an Aho-Corasick automaton in a codegen'd
    * expression). Both engines apply email before IPv4 so nested
    * replacements agree. The regex classes match nothing in the
    * synthetic corpus by construction — their behavior is asserted
    * non-vacuously on a planted fixture in LlmOpsSpec — while the
    * lexicon masks real tokens at every SF.
    *
    * 100 TB shape: pure per-row projection, zero shuffles before the
    * deterministic output sort (which Verify alone needs); codegen'd
    * HOFs + regexp, no UDFs. */
  private val e4Scrub = GraftQuery(
    "llm_e4_text_scrub",
    "broadcast-lexicon term masking + regex PII-class redaction (E4)",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      m AS (
        SELECT doc_id,
               array_to_string(list_transform(t,
                 x -> CASE WHEN x IN ($scrubLexiconSql) THEN '<TERM>' ELSE x END), ' ') AS masked,
               len(list_filter(t, x -> x IN ($scrubLexiconSql))) AS n_masked
        FROM t)
      SELECT doc_id,
             regexp_replace(regexp_replace(masked, '$scrubEmailRe', '<EMAIL>', 'g'),
                            '$scrubIpv4Re', '<IP>', 'g') AS scrubbed,
             CAST(n_masked AS BIGINT) AS n_masked_terms,
             CAST(len(regexp_extract_all(masked, '$scrubEmailRe')) AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(masked, '$scrubIpv4Re')) AS BIGINT) AS n_ips
      FROM m
      ORDER BY doc_id"""),
    (s, dir) => {
      val inLex = (x: Column) => x.isin(scrubLexicon: _*)
      docs(s, dir)
        .select(col("doc_id"), toks(col("text")).as("t"))
        // NULL-THROUGH on null text: every derived column is NULL, like
        // the oracle's natural propagation (string_split(NULL) → NULL →
        // NULL all the way down). Without the guard the engine mixes
        // semantics — concat_ws treats a NULL array as '' (→ scrubbed
        // '', counts 0) while size(NULL) is NULL (measured, round-11
        // null-injection gate).
        .select(col("doc_id"), col("t"),
          when(col("t").isNotNull, concat_ws(" ", transform(col("t"),
            x => when(inLex(x), lit("<TERM>")).otherwise(x)))).as("masked"),
          size(filter(col("t"), inLex)).cast("long").as("n_masked_terms"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(col("masked"), scrubEmailRe, "<EMAIL>"),
            scrubIpv4Re, "<IP>").as("scrubbed"),
          col("n_masked_terms"),
          when(col("t").isNotNull,
            size(regexp_extract_all(col("masked"), lit(scrubEmailRe), lit(0))))
            .cast("long").as("n_emails"),
          when(col("t").isNotNull,
            size(regexp_extract_all(col("masked"), lit(scrubIpv4Re), lit(0))))
            .cast("long").as("n_ips"))
        .orderBy("doc_id")
    })

  private val packTokens = 256
  // the shuffle-key space is hash-partitioned so no single ordering (and
  // no single window task) spans the corpus; at 100 TB this is the knob
  // that turns sequence packing into an embarrassingly parallel
  // per-partition running sum. 16 partitions at demo scale — production
  // sets it to O(executor count).
  private val packParts = 16
  // pack ids are (partition, local pack) flattened as part * 2^20 + local;
  // 2^20 local packs per partition is a demo bound — production widens
  // the shift with the per-partition corpus share
  private val packShift = 1 << 20

  /** Deterministic shuffle + sequence packing: order the corpus by a
    * content-independent hash (reproducible "random" order across
    * engines/runs — what a training job needs for epoch shuffling), then
    * assign contiguous docs into packs of ~packTokens whitespace tokens
    * via a running-sum window. The key space is hash-partitioned (the
    * partition is derived from the shuffle key itself, so both engines
    * compute it identically) and the running sum is per-partition:
    * Spark's Window gets a partitionBy, so the sort never funnels the
    * corpus through one task. Pack ids are (partition, local pack)
    * flattened into one BIGINT. */
  // the pack frame (pack_id, n_docs, pack_tokens) shared by the packing
  // query and the efficiency audit — one definition on each engine side
  private val packCteSql = s"""
      WITH t AS (
        SELECT doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents),
      p AS (
        SELECT doc_id, shuffle_key, n_tokens,
               CAST(('0x' || substr(shuffle_key, 1, 4)) AS BIGINT) % $packParts AS part
        FROM t),
      c AS (
        -- n_tokens completes the total order (round 16): duplicate-key
        -- copies tie on (shuffle_key, doc_id), and under CORRUPTION the
        -- tied copies carry DIFFERENT token counts — a running sum over
        -- a tied order is engine-dependent (the mm_shard_manifest class,
        -- round 15; surfaced here by the 12-axis combined fixture).
        -- Remaining ties have equal n_tokens, so the cum is well-defined.
        SELECT part, n_tokens,
          SUM(n_tokens) OVER (PARTITION BY part ORDER BY shuffle_key, doc_id, n_tokens
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM p),
      packs AS (
        SELECT CAST(part * $packShift + floor((cum - n_tokens) / $packTokens) AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM c
        GROUP BY 1)"""

  private def packFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("part"))
      .orderBy(col("shuffle_key"), col("doc_id"), col("n_tokens")) // total order (see oracle)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("shuffle_key"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("part",
        conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long") % packParts)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        col("part") * packShift + floor((col("cum") - col("n_tokens")) / packTokens))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
  }

  private val e4Pack = GraftQuery(
    "llm_e4_shuffle_pack",
    "deterministic hash-shuffle + partitioned token-budget packing (E4)",
    Some(s"""$packCteSql
      SELECT pack_id, n_docs, pack_tokens FROM packs ORDER BY pack_id"""),
    (s, dir) => packFrame(s, dir).orderBy("pack_id"))

  /** Packing-efficiency audit over [[packFrame]]: how much of the token
    * budget the greedy pack assignment actually fills. `padded_tokens`
    * is what the training job reads after padding every pack up to a
    * multiple of the sequence length; `efficiency_bp` = real/padded in
    * basis points, computed with explicit floor so both engines do the
    * identical double->int step. One extra agg over the (tiny,
    * pack-count-sized) pack frame — the corpus is not rescanned beyond
    * the packing pipeline itself. */
  private val e4PackEff = GraftQuery(
    "llm_e4_pack_efficiency",
    "sequence-packing fill/padding audit over the pack frame (E4)",
    Some(s"""$packCteSql
      SELECT COUNT(*) AS n_packs,
             CAST(SUM(n_docs) AS BIGINT) AS n_docs,
             CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
             CAST(MIN(pack_tokens) AS BIGINT) AS min_pack_tokens,
             CAST(MAX(pack_tokens) AS BIGINT) AS max_pack_tokens,
             CAST(SUM(CAST(ceil(pack_tokens * 1.0 / $packTokens) AS BIGINT) * $packTokens) AS BIGINT) AS padded_tokens,
             CAST(floor(SUM(pack_tokens) * 10000.0 /
               SUM(CAST(ceil(pack_tokens * 1.0 / $packTokens) AS BIGINT) * $packTokens)) AS BIGINT) AS efficiency_bp
      FROM packs"""),
    (s, dir) =>
      packFrame(s, dir)
        .agg(
          count(lit(1)).as("n_packs"),
          sum(col("n_docs")).as("n_docs"),
          sum(col("pack_tokens")).as("total_tokens"),
          min(col("pack_tokens")).as("min_pack_tokens"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          sum(ceil(col("pack_tokens") * lit(1.0) / packTokens).cast("long") * packTokens)
            .as("padded_tokens"))
        .select(col("n_packs"), col("n_docs"), col("total_tokens"),
          col("min_pack_tokens"), col("max_pack_tokens"), col("padded_tokens"),
          floor(col("total_tokens") * lit(10000.0) / col("padded_tokens"))
            .cast("long").as("efficiency_bp")))

  // quality-filter cascade thresholds (Gopher/C4-style rules, tuned so
  // every rule fires on the synthetic corpus — see FilterCascade spec)
  private val cascadeMinTokens = 15
  private val cascadeStopwords = Seq("the", "a", "of", "and", "to")
  private val cascadeMinDistinct = 0.35
  private val cascadeMwl = (3.9, 6.0)

  /** Quality-filter cascade (the C4/Gopher cleaning pass): ordered rules,
    * each doc attributed to its FIRST failing rule — too short, no
    * stopword (gibberish signal), low token diversity (repetition
    * signal), mean-word-length outside the natural-language band — or
    * `pass`. Mean word length is computed as (chars - spaces)/tokens in
    * integer arithmetic before ONE division, so both engines produce the
    * identical double. One scan, all rules evaluated per-row map-side;
    * the only movement is the final orderBy — at 100 TB this is the
    * cheapest pass in the pipeline and the first one run. */
  private val e4Cascade = GraftQuery(
    "llm_e4_filter_cascade",
    "ordered quality-filter cascade, first-failing-rule attribution (E4)",
    Some(s"""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      m AS (SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd,
              list_has_any(w, [${cascadeStopwords.map("'" + _ + "'").mkString(", ")}]) AS has_stop,
              (length(text) - len(w) + 1) * 1.0 / len(w) AS mwl
            FROM t)
      SELECT doc_id,
        CASE WHEN n < $cascadeMinTokens THEN 'r1_too_short'
             WHEN NOT has_stop THEN 'r2_no_stopword'
             WHEN nd * 1.0 / n < $cascadeMinDistinct THEN 'r3_low_diversity'
             WHEN mwl < ${cascadeMwl._1} OR mwl > ${cascadeMwl._2} THEN 'r4_word_shape'
             ELSE 'pass' END AS verdict,
        n AS n_tokens
      FROM m ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("text"), toks(col("text")).as("w"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n"),
          size(array_distinct(col("w"))).cast("long").as("nd"),
          arrays_overlap(col("w"), array(cascadeStopwords.map(lit): _*)).as("has_stop"),
          ((length(col("text")) - size(col("w")) + 1) * lit(1.0) / size(col("w"))).as("mwl"))
        .select(col("doc_id"),
          when(col("n") < cascadeMinTokens, "r1_too_short")
            .when(!col("has_stop"), "r2_no_stopword")
            .when(col("nd") * lit(1.0) / col("n") < cascadeMinDistinct, "r3_low_diversity")
            .when(col("mwl") < cascadeMwl._1 || col("mwl") > cascadeMwl._2, "r4_word_shape")
            .otherwise("pass").as("verdict"),
          col("n").as("n_tokens"))
        .orderBy("doc_id"))

  /** Corpus novelty curve: for each document (in doc_id ingestion
    * order), the fraction of its distinct `spanN`-token windows that NO
    * earlier document contains — the marginal-contribution metric that
    * tells a curation pipeline when a source is exhausted (novelty
    * decays toward boilerplate as ingestion proceeds). A span is novel
    * for the document that first introduces it: min(doc_id) == doc_id.
    *
    * 100 TB shape: reuses the spanWindows generator scan (no shuffle),
    * then distinct (doc, span) pairs, one span-keyed aggregate for the
    * first-seer, a span-keyed join back (AQE can broadcast the firsts
    * side when small), and one doc-keyed rollup — every shuffle keys on
    * span or doc cardinality, partial aggregation bounds hot
    * boilerplate spans, and no all-pairs stage exists. */
  private val e4Novelty = GraftQuery(
    "llm_e4_ngram_novelty",
    s"per-doc novel-$spanN-gram fraction in ingestion order (E4 novelty curve)",
    Some(s"""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= $spanN),
      w AS (
        SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+${spanN - 1}], ' ')) AS span_md5
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - ${spanN - 1})) AS i FROM t)),
      firsts AS (SELECT span_md5, min(doc_id) AS first_doc FROM w GROUP BY span_md5)
      SELECT w.doc_id,
             count(*) AS n_grams,
             CAST(SUM(CASE WHEN f.first_doc = w.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             CAST(SUM(CASE WHEN f.first_doc = w.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS novelty
      FROM w JOIN firsts f USING (span_md5)
      GROUP BY w.doc_id
      ORDER BY w.doc_id"""),
    (s, dir) => {
      // first-seer via a window MIN over the span partition instead of
      // the aggregate + self-join spelling (guide §2.4 — two operations
      // keyed the same way share one exchange): the groupBy(span)+join
      // form shuffles the (doc, span) set on span twice (once into the
      // firsts aggregate, once as the join probe side) and runs a
      // sort-merge join; the window form shuffles it once and attaches
      // min(doc_id) in place. Same rows (min over the partition equals
      // the joined first_doc). r19 A/B at sf0.1: 2.7-3.5 s → 1.9-2.2 s,
      // identical output. The window key is span_md5 — cardinality
      // scales with corpus content, and hot boilerplate spans bound the
      // partition the same way the join's shuffle key did.
      import org.apache.spark.sql.expressions.Window
      val w = spanWindows(s, dir).select(col("doc_id"), col("span_md5")).distinct()
      w.withColumn("first_doc",
          min(col("doc_id")).over(Window.partitionBy(col("span_md5"))))
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
        .orderBy("doc_id")
    })

  def queries: Seq[GraftQuery] = Seq(
    e1, e1Stats, e1Incremental, e2Jaccard, e2MinHash, e2Incremental, e2SimHash, e2EmbedCosine, e2Clusters,
    e2DedupApply, e2ClusterSafeSplit, e2Decontam, e2BloomDecontam, e2RepeatedSpans, e2SpanCut, e2LongRepeats, e3TopK, e3Ann, e3Ivf, e3EvalNN, e3KnnClassify, e3Centroids,
    e4Terms, e4Quality,
    e4LangId, e4Fingerprint, e4Rolling, e4Repetition, e4Chunk, e4Mix, e4Scrub,
    e4Surprisal, e4Split, e4Pack, e4PackEff, e4Cascade, e4Novelty)
}
