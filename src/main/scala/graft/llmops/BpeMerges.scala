package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge-table learning (extension family E4) — the tokenizer
  * TRAINING stage (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"): starting from character-level
  * symbols, repeatedly find the most frequent adjacent symbol pair
  * across the corpus and merge it, emitting the ordered merge table a
  * BPE tokenizer replays at encode time. This closes the one
  * LLM-pipeline stage the engine consumed but never learned —
  * `llm_e4_doc_quality` tokenizes with a fixed BPE-ish regex; this op
  * produces the merge rules themselves.
  *
  * Semantics pinned by the contract query:
  *  - training corpus = whitespace tokens of `documents.text` that are
  *    pure lowercase ascii (`^[a-z]+$`) — the pre-tokenizer is a
  *    deliberate contract choice (production swaps in its own
  *    normalizer); it also keeps every symbol free of spaces and regex
  *    metacharacters, so the space-joined symbol-string fold below is
  *    exact on BOTH engines (Java regex counts UTF-16 units where RE2
  *    counts codepoints — ascii sidesteps the divergence).
  *  - pair counts weight by word FREQUENCY (classic BPE trains on the
  *    word-count table, not the raw corpus), counting every adjacent
  *    occurrence (a word "aaa" contributes 2 to (a,a)).
  *  - the argmax is tie-broken on (count DESC, left ASC, right ASC) — a
  *    TOTAL order (pairs are unique per aggregation), per the repo's
  *    tie-break discipline.
  *  - merge application is leftmost-greedy non-overlapping ("a a a"
  *    under (a,a) -> "aa a"), expressed as a fold over the space-joined
  *    symbol string: replace the trailing symbol when it equals `left`
  *    and the incoming symbol equals `right`. No just-merged flag is
  *    needed — a merged trailing symbol is `left||right`, which can
  *    never equal `left` (symbols are nonempty). The oracle replays the
  *    identical fold via DuckDB `list_reduce`; the `[^ ]+$`
  *    trailing-symbol regex behaves identically under Spark's
  *    replace-all (the one non-empty match is the trailing run) and
  *    DuckDB's replace-first.
  *
  * 100 TB shape: ONE corpus pass builds the word-frequency table (hash
  * aggregation with map-side partials, output vocabulary-bounded and
  * Zipf-sparse — the `llm_e4_term_frequencies` bound), memoized; every
  * one of the k iterations then runs entirely on that vocab-bounded
  * frame (narrow fold projections + a pair-keyed aggregation whose
  * output is <= vocab² and in practice tiny), and exchanges exactly ONE
  * row with the driver (the argmax pick — the CCNet/DSIR constant-size
  * exchange shape, re-applied to the next iteration as plan literals).
  * Nothing corpus-sized runs more than once; nothing driver-side grows
  * with the corpus. The emitted merge table is k rows.
  */
object BpeMerges {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")

  /** Number of merge iterations the contract query learns. Fixed so the
    * oracle unrolls to k static CTE rounds. */
  private[llmops] val mergeK = 8

  /** The word-frequency training table (word, seq = space-joined char
    * symbols, freq): the single corpus-sized pass, memoized per
    * (session, dir); `word` is kept so the encode pass can join the
    * corpus word stream back to its subword count. */
  private[llmops] def bpeWords(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "bpe_words") {
      docs(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .select(col("word"),
          rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"),
          col("freq"))
    }

  /** Leftmost-greedy application of one merge to the space-joined
    * symbol string in `seq`, as a narrow fold projection over the
    * pre-split array `s0` — shared by training and encode so both
    * apply ONE definition of a merge. */
  private def foldMerge(l: String, r: String): org.apache.spark.sql.Column =
    aggregate(
      slice(col("s0"), lit(2), size(col("s0")) - 1),
      element_at(col("s0"), 1),
      (acc, x) =>
        when(regexp_extract(acc, "[^ ]+$", 0) === lit(l) && x === lit(r),
          regexp_replace(acc, "[^ ]+$", l + r))
          .otherwise(concat(acc, lit(" "), x)))

  /** One learned merge: (step, lhs, rhs, merged, pair_count). */
  private[llmops] final case class Merge(
      step: Int, lhs: String, rhs: String, merged: String, pairCount: Long)

  /** Train the merge table: k iterations of vocab-bounded pair counting
    * + a 1-row argmax collect, each applied back as plan literals.
    * Driver state is k rows total; memoized per (session, dir) so
    * reconstruction (Verify's oracle pass, repeated specs) is free. */
  private[llmops] def learnedMerges(s: SparkSession, dir: String): Seq[Merge] =
    learnedMerges(s, dir, mergeK)

  /** [[learnedMerges]] at an arbitrary round count `k` — the
    * [[BpeProbe]] stress path (the CONTRACT stays at [[mergeK]]; the
    * probe proves the per-round cost stays flat in k, i.e. the
    * localCheckpoint lineage truncation holds). Per-k memo key, so
    * stress rounds never collide with the contract's table. */
  private[llmops] def learnedMerges(s: SparkSession, dir: String, k: Int): Seq[Merge] =
    graft.SessionMemo.value(s, dir,
      if (k == mergeK) "bpe_merges" else s"bpe_merges_k$k") {
      var cur = bpeWords(s, dir)
      val out = scala.collection.mutable.ArrayBuffer[Merge]()
      var i = 1
      var exhausted = false
      while (i <= k && !exhausted) {
        val pick = cur
          .select(split(col("seq"), " ", -1).as("s"), col("freq"))
          .filter(size(col("s")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(s) - 1), " +
              "j -> struct(element_at(s, j) AS l, element_at(s, j + 1) AS r))"))
            .as("p"))
          .select(col("freq"), col("p.l").as("l"), col("p.r").as("r"))
          .groupBy(col("l"), col("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        if (pick.isEmpty) exhausted = true
        else {
          val (l, r, cnt) =
            (pick(0).getString(0), pick(0).getString(1), pick(0).getLong(2))
          out += Merge(i, l, r, l + r, cnt)
          // leftmost-greedy merge application as a narrow fold projection;
          // l/r/merged are driver literals. localCheckpoint TRUNCATES the
          // lineage each round: without it iteration i's plan nests i-1
          // fold lambdas, and analyzer/optimizer work plus the broadcast
          // task binary grow with the chain (measured 7.4s for k=8 at
          // sf0.1 — nearly all driver-side plan work over a tiny vocab
          // frame; truncated: the pair-agg plans stay depth-1). The
          // checkpointed frame is vocab-bounded, the standard caveat
          // (recompute impossible after executor loss) bounded to one
          // training round's scratch.
          cur = cur
            .select(split(col("seq"), " ", -1).as("s0"), col("freq"))
            .select(foldMerge(l, r).as("seq"), col("freq"))
            .localCheckpoint(true)
          i += 1
        }
      }
      out.toSeq
    }

  private def mergesFrame(s: SparkSession, dir: String): DataFrame = {
    val rows = learnedMerges(s, dir)
      .map(m => Row(m.step, m.lhs, m.rhs, m.merged, m.pairCount))
    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema).orderBy(col("step"))
  }

  /** DuckDB oracle: the identical k rounds unrolled as static CTEs —
    * the same fold via `list_reduce`, the same (cnt DESC, l, r) argmax
    * via ORDER BY ... LIMIT 1, the same ascii-word training table. */
  private def oracleSql: String = {
    val rounds = (1 to mergeK).map { n =>
      s"""p$n AS (
        SELECT s[j] AS l, s[j + 1] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS j
              FROM (SELECT string_split(seq, ' ') AS s, freq FROM w${n - 1})
              WHERE len(s) >= 2)
        GROUP BY l, r),
      m$n AS MATERIALIZED (SELECT l, r, cnt FROM p$n ORDER BY cnt DESC, l, r LIMIT 1),
      w$n AS MATERIALIZED (
        SELECT CASE WHEN m.l IS NULL THEN w.seq ELSE
          list_reduce(string_split(w.seq, ' '), (acc, x) -> CASE
            WHEN regexp_extract(acc, '[^ ]+$$') = m.l AND x = m.r
            THEN regexp_replace(acc, '[^ ]+$$', m.l || m.r)
            ELSE acc || ' ' || x END) END AS seq, w.freq
        FROM w${n - 1} w LEFT JOIN m$n m ON TRUE)"""
    }.mkString(",\n      ")
    val emits = (1 to mergeK).map { n =>
      s"SELECT $n AS step, l AS lhs, r AS rhs, l || r AS merged, cnt AS pair_count FROM m$n"
    }.mkString("\n        UNION ALL ")
    s"""
      WITH w0 AS MATERIALIZED (
        SELECT rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents WHERE text IS NOT NULL)
        WHERE regexp_matches(word, '^[a-z]+$$')
        GROUP BY 1),
      $rounds
      SELECT * FROM (
        $emits)
      ORDER BY step"""
  }

  private val merges = GraftQuery(
    "llm_e4_bpe_merges",
    s"BPE merge-table learning, $mergeK vocab-bounded pair-count iterations (E4)",
    Some(oracleSql),
    (s, dir) => mergesFrame(s, dir))

  /** BPE ENCODE — apply the learned merge table to the corpus and
    * report per-document subword statistics (n_words, n_subwords,
    * fertility = subwords/word on the q4 grid): the tokenizer's
    * deployment half, and the metric (fertility) every tokenizer
    * evaluation reports. Non-ascii words pass through as one opaque
    * token each (byte-fallback posture); docs with no words (null or
    * whitespace-only text) report 0/0 with NULL fertility — total,
    * nothing dropped.
    *
    * 100 TB shape: the k merge folds run over the VOCAB-BOUNDED word
    * table, never the corpus — each distinct word is encoded exactly
    * once (the production trick: encode cost is O(vocab), corpus cost
    * is a word-keyed join to the encoded table, AQE-broadcastable);
    * the per-doc aggregation is the one doc_id-keyed shuffle.
    *
    * The oracle is GENERATED ([[GraftQuery.oracleGen]]): the learned
    * merges are data-dependent driver values (deterministic and
    * memoized per (session, dir) — the PQ-codebook pattern), embedded
    * into the unrolled fold CTEs as literals. */
  private def encodedVocab(s: SparkSession, dir: String): DataFrame = {
    var enc = bpeWords(s, dir).select(col("word"), col("seq"))
    learnedMerges(s, dir).foreach { m =>
      enc = enc
        .select(col("word"), split(col("seq"), " ", -1).as("s0"))
        .select(col("word"), foldMerge(m.lhs, m.rhs).as("seq"))
    }
    enc.select(col("word"),
      size(split(col("seq"), " ", -1)).cast("long").as("n_sub"))
  }

  private def encodeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = docs(s, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("word"))
      .filter(length(col("word")) > 0)
    val agg = w
      .join(encodedVocab(s, dir), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_sub"), lit(1L))).as("n_subwords"))
    docs(s, dir).select(col("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        when(col("n_words").isNull, lit(null).cast("double"))
          .otherwise(LlmOps.q4(col("n_subwords").cast("double") / col("n_words")))
          .as("fertility"))
      .orderBy(col("doc_id"))
  }

  private def encodeOracleSql(s: SparkSession, dir: String): String = {
    val ms = learnedMerges(s, dir)
    val folds = ms.zipWithIndex.map { case (m, ix) =>
      s"""enc${ix + 1} AS (
        SELECT w, list_reduce(string_split(seq, ' '), (acc, x) -> CASE
          WHEN regexp_extract(acc, '[^ ]+$$') = '${m.lhs}' AND x = '${m.rhs}'
          THEN regexp_replace(acc, '[^ ]+$$', '${m.merged}')
          ELSE acc || ' ' || x END) AS seq
        FROM enc$ix)"""
    }
    val chain = if (folds.isEmpty) "" else folds.mkString(",\n      ", ",\n      ", "")
    s"""
      WITH words AS (
        SELECT doc_id, w FROM (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents WHERE text IS NOT NULL)
        WHERE len(w) > 0),
      enc0 AS (
        SELECT w, rtrim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS seq
        FROM (SELECT DISTINCT w FROM words WHERE regexp_matches(w, '^[a-z]+$$')))$chain,
      enc AS (
        SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_sub
        FROM enc${ms.length}),
      a AS (
        SELECT words.doc_id, COUNT(*) AS n_words,
               CAST(SUM(coalesce(enc.n_sub, 1)) AS BIGINT) AS n_subwords
        FROM words LEFT JOIN enc ON words.w = enc.w
        GROUP BY words.doc_id)
      SELECT d.doc_id,
             coalesce(a.n_words, 0) AS n_words,
             coalesce(a.n_subwords, 0) AS n_subwords,
             CASE WHEN a.n_words IS NULL THEN NULL
                  ELSE ${LlmOps.q4Sql("CAST(a.n_subwords AS DOUBLE) / a.n_words")}
             END AS fertility
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""
  }

  private val encode = GraftQuery(
    "llm_e4_bpe_encode",
    "BPE encode: learned merges applied via the vocab table, per-doc fertility (E4)",
    None,
    (s, dir) => encodeFrame(s, dir),
    oracleGen = Some(encodeOracleSql))

  def queries: Seq[GraftQuery] = Seq(merges, encode)
}
