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

  /** The word-frequency training table (seq = space-joined char symbols,
    * freq): the single corpus-sized pass, memoized per (session, dir). */
  private def bpeWords(s: SparkSession, dir: String): DataFrame =
    graft.SessionMemo.materialized(s, dir, "bpe_words") {
      docs(s, dir)
        .filter(col("text").isNotNull)
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .select(rtrim(regexp_replace(col("word"), "(.)", "$1 ")).as("seq"),
          col("freq"))
    }

  /** One learned merge: (step, lhs, rhs, merged, pair_count). */
  private[llmops] final case class Merge(
      step: Int, lhs: String, rhs: String, merged: String, pairCount: Long)

  /** Train the merge table: k iterations of vocab-bounded pair counting
    * + a 1-row argmax collect, each applied back as plan literals.
    * Driver state is k rows total; memoized per (session, dir) so
    * reconstruction (Verify's oracle pass, repeated specs) is free. */
  private[llmops] def learnedMerges(s: SparkSession, dir: String): Seq[Merge] =
    graft.SessionMemo.value(s, dir, "bpe_merges") {
      var cur = bpeWords(s, dir)
      val out = scala.collection.mutable.ArrayBuffer[Merge]()
      var i = 1
      var exhausted = false
      while (i <= mergeK && !exhausted) {
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
          // l/r/merged are driver literals, so the plan stays linear in k
          cur = cur
            .select(split(col("seq"), " ", -1).as("s0"), col("freq"))
            .select(
              aggregate(
                slice(col("s0"), lit(2), size(col("s0")) - 1),
                element_at(col("s0"), 1),
                (acc, x) =>
                  when(regexp_extract(acc, "[^ ]+$", 0) === lit(l) && x === lit(r),
                    regexp_replace(acc, "[^ ]+$", l + r))
                    .otherwise(concat(acc, lit(" "), x))).as("seq"),
              col("freq"))
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
      m$n AS (SELECT l, r, cnt FROM p$n ORDER BY cnt DESC, l, r LIMIT 1),
      w$n AS (
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
      WITH w0 AS (
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

  def queries: Seq[GraftQuery] = Seq(merges)
}
