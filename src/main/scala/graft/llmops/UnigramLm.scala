package graft.llmops

import graft.GraftQuery
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM tokenizer TRAINING (extension family E4) — the
  * SentencePiece complement of [[BpeMerges]] (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates"): seed a substring vocabulary, then
  * alternate (E) best-path segmentation of the word table under the
  * current piece log-probabilities with (prune + M) dropping the
  * lowest-usage pieces and re-estimating probabilities — hard-EM, the
  * deterministic member of Kudo's family (soft EM's forward-backward
  * expected counts are real-valued and engine-order-sensitive; the
  * Viterbi counts are integers, so every round is exactly
  * reproducible on both engines).
  *
  * Semantics pinned by the contract query:
  *  - training words = the BPE pre-tokenizer's word table
  *    ([[BpeMerges.bpeWords]]: whitespace tokens matching `^[a-z]+$`,
  *    frequency-weighted) restricted to length <= [[maxWordLen]] — the
  *    length cap is a contract constant (production raises it) that
  *    lets the Viterbi DP unroll to [[maxWordLen]] STATIC position
  *    columns on both engines: no recursion, no UDF, the same
  *    expression tree in Spark and in the generated DuckDB SQL.
  *  - seed vocabulary = every single character (segmentation stays
  *    total) plus the top-[[seedMultiV]] multi-char substrings of
  *    length <= [[maxPieceLen]] by (occurrence count DESC, piece ASC);
  *    seed log-probs from raw substring counts.
  *  - piece scores live on the 1e-7 integer ln grid ([[LlmOps.ln7]]'s
  *    contract): DP path scores are sums of <= [[maxWordLen]]
  *    integer-valued doubles, so comparisons are EXACT in any
  *    partitioning on any engine; the one division (grid -> logp)
  *    happens at output.
  *  - Viterbi tie-break: candidate last-pieces are tried LONGEST
  *    FIRST and replaced only by a STRICTLY better score, so equal
  *    paths resolve to the longest-final-piece segmentation — a total
  *    deterministic order shared by both engines' expression trees.
  *  - each of the [[emRounds]] rounds drops the floor(multi/4)
  *    lowest-usage multi-char pieces by (usage ASC, piece ASC) —
  *    single characters are never dropped — then re-estimates
  *    log-probs with add-one smoothing (Viterbi usage can be zero;
  *    ln(0) must not enter the grid).
  *
  * 100 TB shape: the ONE corpus-sized pass is the shared memoized
  * word-frequency table ([[BpeMerges.bpeWords]] — also BPE's); every
  * round runs on the VOCAB-BOUNDED word table (a static-width DP
  * projection + a piece-keyed aggregation) and exchanges piece-count
  * rows with the driver (vocabulary-sized — the CCNet/DSIR/BPE
  * constant-exchange shape), re-applied as plan literals. The emitted
  * vocabulary is a driver-held local relation.
  *
  * Reference scope note: the reference pipeline
  * (`/root/reference/call-debias.py`) sends raw record text to its
  * annotator and never tokenizes, let alone learns a tokenizer; this
  * op (like BPE) is part of the mandated LLM-pipeline extension
  * surface.
  */
object UnigramLm {

  /** Longest candidate piece the DP considers. */
  private[llmops] val maxPieceLen = 4

  /** Training-word length cap — the constant that makes the DP
    * statically unrollable (positions 1..maxWordLen). */
  private[llmops] val maxWordLen = 8

  /** Multi-char seed pieces kept (single chars always enter). */
  private[llmops] val seedMultiV = 32

  /** EM(prune) rounds the contract query unrolls. */
  private[llmops] val emRounds = 3

  /** Driver mirror of [[LlmOps.ln7]] — the same `Math.log` the Spark
    * `ln` expression executes on this JVM, truncated onto the same
    * 1e-7 integer grid, so driver-computed piece scores and any
    * Spark-computed twin are bit-identical. */
  private def ln7d(x: Double): Double = {
    val y = math.log(x) * 1.0e7
    y - (y % 1.0)
  }

  private def trainWords(s: SparkSession, dir: String): DataFrame =
    BpeMerges.bpeWords(s, dir)
      .select(col("word"), col("freq"))
      .filter(length(col("word")) <= maxWordLen)

  /** All substrings of `word` with length 1..maxPieceLen, one element
    * per OCCURRENCE (a repeated substring counts each position). */
  private def substrExpr: String =
    "flatten(transform(sequence(1, length(word)), i -> " +
      s"transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), " +
      "j -> substring(word, i, j - i + 1))))"

  /** A trained vocabulary entry: piece, its Viterbi usage count from
    * the final E-step (word-frequency-weighted), and its grid
    * log-prob (integer-valued double; divide by 1e7 for the logp). */
  private[llmops] final case class VocabEntry(piece: String, nUses: Long, lpGrid: Double)

  /** One Viterbi E-step: segment every training word under the piece
    * log-prob map (plan literal), emitting (word, freq, seg) with seg
    * the space-joined best path. Statically unrolled DP: position i's
    * state is struct(sc, seg); candidates are the <= maxPieceLen
    * last-piece lengths, tried longest first, strictly-greater
    * replaces. Single chars are always in the vocabulary, so every
    * position is reachable. */
  private def segmented(w: DataFrame, lp: Map[String, Double]): DataFrame = {
    val lpLit = typedLit(lp)
    var df = w
    for (i <- 1 to maxWordLen) {
      val lens = math.min(i, maxPieceLen) to 1 by -1
      // candidates land as their OWN helper columns first (the oracle's
      // d_{i}a CTE trick, mirrored): the best-of fold references each
      // candidate 3x, and folding over inline trees replicates every
      // candidate subtree 3^(candidates-1) times — measured as multi-MB
      // task binaries and ~6s of per-plan analysis/codegen overhead on a
      // 31-row word table before this split. Folding over ATTRIBUTES
      // keeps the tree linear (CollapseProject does not inline non-cheap
      // aliases referenced more than once).
      lens.foreach { len =>
        val j = i - len
        val piece = substring(col("word"), j + 1, len)
        val look = element_at(lpLit, piece)
        val prevOk = if (j == 0) lit(true) else col(s"p$j").isNotNull
        val prevSc: Column = if (j == 0) lit(0.0) else col(s"p$j").getField("sc")
        val seg =
          if (j == 0) piece
          else concat(col(s"p$j").getField("seg"), lit(" "), piece)
        df = df.withColumn(s"c${i}_$len",
          when(prevOk && look.isNotNull,
            struct((prevSc + look).as("sc"), seg.as("seg"))))
      }
      val best = lens.map(len => col(s"c${i}_$len")).reduce((b, c) =>
        when(b.isNull, c)
          .when(c.isNull, b)
          .when(c.getField("sc") > b.getField("sc"), c)
          .otherwise(b))
      df = df.withColumn(s"p$i", best)
        .drop(lens.map(len => s"c${i}_$len"): _*)
    }
    val segSel = (1 to maxWordLen).foldLeft(lit(null).cast("string")) { (acc, i) =>
      when(length(col("word")) === i, col(s"p$i").getField("seg")).otherwise(acc)
    }
    df.select(w.columns.map(col).toSeq :+ segSel.as("seg"): _*)
  }

  /** Train the vocabulary: seed + [[emRounds]] hard-EM prune rounds.
    * Driver state is vocabulary-sized rows per round; memoized per
    * (session, dir) so reconstruction is free. */
  private[llmops] def trainedVocab(s: SparkSession, dir: String): Seq[VocabEntry] =
    graft.SessionMemo.value(s, dir, "unigram_vocab") {
      val w = trainWords(s, dir)
      val pieceCnt = w
        .select(col("freq"), explode(expr(substrExpr)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
        .persist()
      // ONE collect for both seed classes (chars ∪ top-K multis) — the
      // two-collect spelling paid two driver-scheduled jobs over the
      // same persisted frame; a union of the two filters is one job,
      // and seed-list ORDER is immaterial downstream (all consumers are
      // sums, maps, or deterministic per-element sorts).
      val seed = pieceCnt.filter(length(col("piece")) === 1)
        .unionByName(pieceCnt.filter(length(col("piece")) > 1)
          .orderBy(col("cnt").desc, col("piece")).limit(seedMultiV))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      pieceCnt.unpersist()
      if (seed.isEmpty) Seq.empty[VocabEntry]
      else {
        val seedTotal = seed.map(_._2).sum
        // (piece, usage-or-seed-count, grid lp)
        var vocab: Seq[(String, Long, Double)] =
          seed.map { case (p, c) => (p, c, ln7d(c.toDouble) - ln7d(seedTotal.toDouble)) }
        for (_ <- 1 to emRounds) {
          val lpMap = vocab.map(v => v._1 -> v._3).toMap
          val used = segmented(w, lpMap)
            .select(col("freq"), explode(split(col("seg"), " ", -1)).as("piece"))
            .groupBy(col("piece")).agg(sum(col("freq")).as("u"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val usage = vocab.map(v => v._1 -> used.getOrElse(v._1, 0L)).toMap
          val multiPieces = vocab.map(_._1).filter(_.length > 1)
          val dropK = multiPieces.size / 4
          val dropped = multiPieces.sortBy(p => (usage(p), p)).take(dropK).toSet
          val survivors = vocab.map(_._1).filterNot(dropped)
          val totalU = survivors.map(usage).sum + survivors.size
          vocab = survivors.map(p =>
            (p, usage(p), ln7d(usage(p) + 1.0) - ln7d(totalU.toDouble)))
        }
        vocab.map { case (p, u, g) => VocabEntry(p, u, g) }
      }
    }

  private def vocabFrame(s: SparkSession, dir: String): DataFrame = {
    val rows = trainedVocab(s, dir)
      .sortBy(_.piece)
      .map(v => Row(v.piece, v.nUses, v.lpGrid / 1.0e7))
    val schema = StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("n_uses", LongType, nullable = false),
      StructField("logp", DoubleType, nullable = false)))
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema).orderBy(col("piece"))
  }

  // -------------------------------------------------------------------
  // Generated DuckDB oracle: the identical seed + rounds, positions and
  // rounds both statically unrolled; per-round CTEs MATERIALIZED (an
  // inlined round chain re-scans the base 2^k times — the BPE lesson).
  // -------------------------------------------------------------------

  private def ln7Sql(e: String): String = LlmOps.ln7Sql(e)

  /** The DP candidate for position `i`, last-piece length `len`, as a
    * SQL expression over word + p1..p{i-1} and the round's vocab CTE. */
  private def candSql(vcte: String, i: Int, len: Int): String = {
    val j = i - len
    val piece = s"substr(word, ${j + 1}, $len)"
    val look = s"(SELECT lp FROM $vcte vv WHERE vv.piece = $piece)"
    val prevOk = if (j == 0) "TRUE" else s"p$j IS NOT NULL"
    val prevSc = if (j == 0) "0.0" else s"struct_extract(p$j, 'sc')"
    val seg =
      if (j == 0) piece
      else s"struct_extract(p$j, 'seg') || ' ' || $piece"
    s"""CASE WHEN $prevOk AND $look IS NOT NULL
        THEN struct_pack(sc := $prevSc + $look, seg := $seg) END"""
  }

  /** The statically-unrolled DP CTE chain: positions 1..maxWordLen
    * over `<p>_0` (which must provide `word` plus any carried
    * columns), vocab lookups against `vcte`(piece, lp). Emits CTE
    * pairs `<p>_1a`,`<p>_1` .. `<p>_{maxWordLen}`. Shared by the
    * training rounds and the encode oracle. */
  private def dpChainSql(p: String, vcte: String): String =
    (1 to maxWordLen).map { i =>
      val lens = math.min(i, maxPieceLen) to 1 by -1
      val candCols = lens
        .map(len => s"${candSql(vcte, i, len)} AS c${i}_$len")
        .mkString(",\n          ")
      val fold = lens.map(len => s"c${i}_$len").reduce { (b, c) =>
        s"""CASE WHEN ($b) IS NULL THEN $c WHEN $c IS NULL THEN ($b)
            WHEN struct_extract($c, 'sc') > struct_extract(($b), 'sc') THEN $c
            ELSE ($b) END"""
      }
      val helperCols = lens.map(len => s"c${i}_$len").mkString(", ")
      s"""${p}_${i}a AS (
        SELECT *,
          $candCols
        FROM ${p}_${i - 1}),
      ${p}_$i AS (
        SELECT * EXCLUDE ($helperCols), $fold AS p$i FROM ${p}_${i}a)"""
    }.mkString(",\n      ")

  private def segCaseSql: String =
    (1 to maxWordLen)
      .map(i => s"WHEN $i THEN struct_extract(p$i, 'seg')")
      .mkString(" ")

  /** One round's DP + usage + prune + M-step CTE chain. `r` is the
    * round index (vocab v{r-1} in, v{r} out). */
  private def roundSql(r: Int): String = {
    val prevV = s"v${r - 1}"
    val segCase = segCaseSql
    s"""d${r}_0 AS (SELECT word, freq FROM w0),
      ${dpChainSql(s"d$r", prevV)},
      seg$r AS MATERIALIZED (
        SELECT freq, CASE len(word) $segCase END AS seg FROM d${r}_$maxWordLen),
      u$r AS MATERIALIZED (
        SELECT v.piece, CAST(coalesce(SUM(t.freq), 0) AS BIGINT) AS u
        FROM $prevV v LEFT JOIN (
          SELECT freq, unnest(string_split(seg, ' ')) AS piece FROM seg$r) t
        ON t.piece = v.piece
        GROUP BY v.piece),
      s$r AS (
        SELECT piece, u FROM u$r WHERE len(piece) = 1
        UNION ALL
        SELECT piece, u FROM (
          SELECT piece, u, row_number() OVER (ORDER BY u, piece) AS rn,
                 count(*) OVER () AS m
          FROM u$r WHERE len(piece) > 1)
        WHERE rn > m // 4),
      v$r AS MATERIALIZED (
        SELECT piece, u,
          ${ln7Sql("(u + 1)")} -
          ${ln7Sql(s"(SELECT CAST(SUM(u) AS BIGINT) + COUNT(*) FROM s$r)")} AS lp
        FROM s$r)"""
  }

  private def oracleSql: String = {
    val rounds = (1 to emRounds).map(roundSql).mkString(",\n      ")
    s"""
      WITH w0 AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE regexp_matches(word, '^[a-z]+$$') AND len(word) <= $maxWordLen
        GROUP BY 1),
      pc AS MATERIALIZED (
        SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (
          SELECT substr(word, i, l) AS piece, freq
          FROM (SELECT word, freq, unnest(generate_series(1, len(word))) AS i
                FROM w0) a,
               (SELECT unnest(generate_series(1, $maxPieceLen)) AS l) b
          WHERE i + l - 1 <= len(word))
        GROUP BY piece),
      seedsel AS (
        SELECT piece, cnt FROM pc WHERE len(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
          FROM pc WHERE len(piece) > 1)
        WHERE rn <= $seedMultiV),
      v0 AS MATERIALIZED (
        SELECT piece, cnt AS u,
          ${ln7Sql("cnt")} -
          ${ln7Sql("(SELECT CAST(SUM(cnt) AS BIGINT) FROM seedsel)")} AS lp
        FROM seedsel),
      $rounds
      SELECT piece, u AS n_uses, lp / 10000000.0 AS logp
      FROM v$emRounds
      ORDER BY piece"""
  }

  private val train = GraftQuery(
    "llm_e4_unigram_lm",
    s"unigram-LM (SentencePiece-style) tokenizer training: seed top-$seedMultiV substrings, $emRounds hard-EM prune rounds on the ln7 grid (E4)",
    Some(oracleSql),
    (s, dir) => vocabFrame(s, dir))

  // -------------------------------------------------------------------
  // Encode: apply the trained vocabulary to the corpus (the tokenizer's
  // deployment half, mirroring llm_e4_bpe_encode for comparability)
  // -------------------------------------------------------------------

  /** Per-doc unigram-LM tokenization statistics: n_words, n_pieces,
    * fertility — Viterbi under the TRAINED vocabulary. Words outside
    * the training contract (non-ascii, or longer than [[maxWordLen]])
    * pass through as one opaque token each, the byte-fallback posture
    * BPE encode also takes; docs with no words report 0/0 with NULL
    * fertility.
    *
    * 100 TB shape (the bpe_encode shape): the DP runs over the
    * VOCAB-BOUNDED distinct-word table — each distinct word is
    * segmented exactly once; corpus cost is a word-keyed join to the
    * encoded table plus the one per-doc aggregation shuffle. The
    * oracle is GENERATED: the trained vocabulary is a deterministic
    * memoized driver value (the PQ-codebook pattern), embedded as a
    * literal VALUES relation under the same statically-unrolled DP. */
  private def encodeFrame(s: SparkSession, dir: String): DataFrame = {
    val lpMap = trainedVocab(s, dir).map(v => v.piece -> v.lpGrid).toMap
    val d = graft.T(s, dir, "documents")
    val w = d
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
    val encodable = w.select(col("word")).distinct()
      .filter(col("word").rlike("^[a-z]+$") && length(col("word")) <= maxWordLen)
    val encoded =
      if (lpMap.isEmpty) encodable.select(col("word"), lit(1L).as("n_sub"))
      else segmented(encodable, lpMap)
        .select(col("word"),
          size(split(col("seg"), " ", -1)).cast("long").as("n_sub"))
    val agg = w
      .join(encoded, Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), lit(1L))).as("n_pieces"))
    d.select(col("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(col("n_words").isNull, lit(null).cast("double"))
          .otherwise(LlmOps.q4(col("n_pieces").cast("double") / col("n_words")))
          .as("fertility"))
      .orderBy(col("doc_id"))
  }

  private def encodeOracleSql(s: SparkSession, dir: String): String = {
    val vocab = trainedVocab(s, dir)
    // the trained vocabulary as a literal relation; lp is an
    // integer-grid double, rendered exactly (values are integral)
    val encCtes =
      if (vocab.isEmpty)
        // no trained vocabulary (no trainable words): every encodable
        // word falls back to one opaque token, like the engine
        "encn AS (SELECT word, CAST(1 AS BIGINT) AS n_sub FROM e_0)"
      else {
        val vals = vocab
          // locale-proof literal (repo convention, see SemDedup.dlit): the
          // f-interpolator is locale-sensitive and renders ',' decimals on
          // comma-decimal JVMs, corrupting the VALUES relation
          .map(v => s"('${v.piece}', CAST('${java.lang.Double.toString(v.lpGrid)}' AS DOUBLE))")
          .mkString(", ")
        s"""vf(piece, lp) AS (VALUES $vals),
      ${dpChainSql("e", "vf")},
      segf AS (
        SELECT word, CASE len(word) $segCaseSql END AS seg FROM e_$maxWordLen),
      encn AS (
        SELECT word, CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_sub
        FROM segf)"""
      }
    s"""
      WITH words AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents WHERE text IS NOT NULL)
        WHERE len(w) > 0),
      e_0 AS (
        SELECT DISTINCT w AS word FROM words
        WHERE regexp_matches(w, '^[a-z]+$$') AND len(w) <= $maxWordLen),
      $encCtes,
      a AS (
        SELECT words.doc_id, COUNT(*) AS n_words,
               CAST(SUM(coalesce(encn.n_sub, 1)) AS BIGINT) AS n_pieces
        FROM words LEFT JOIN encn ON words.w = encn.word
        GROUP BY words.doc_id)
      SELECT d.doc_id,
             coalesce(a.n_words, 0) AS n_words,
             coalesce(a.n_pieces, 0) AS n_pieces,
             CASE WHEN a.n_words IS NULL THEN NULL
                  ELSE ${LlmOps.q4Sql("CAST(a.n_pieces AS DOUBLE) / a.n_words")}
             END AS fertility
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""
  }

  private val encode = GraftQuery(
    "llm_e4_unigram_encode",
    "unigram-LM encode: trained vocabulary applied via Viterbi over the distinct-word table, per-doc fertility (E4)",
    None,
    (s, dir) => encodeFrame(s, dir),
    oracleGen = Some(encodeOracleSql))

  def queries: Seq[GraftQuery] = Seq(train, encode)
}
