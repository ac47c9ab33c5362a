package graft.llmops

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min-count vocabulary pruning (extension family E4, continued) — the
  * frequency-threshold vocabulary cut every embedding/LM training recipe
  * applies before building its vocabulary (word2vec `min_count`, BPE
  * merge-table floors, fastText threshold): tokens whose corpus document
  * frequency falls below the cut are rewritten to `<UNK>` so the
  * downstream vocabulary is bounded and rare (often identifying) strings
  * never reach the model — the frequency-side complement of
  * `llm_e4_text_scrub`'s STATIC lexicon masking (here the lexicon is
  * DERIVED from corpus statistics, so it adapts to the corpus instead of
  * needing curation).
  *
  * The contract query pins the rank form of the cut — the
  * [[VocabPrune.pruneK]] rarest vocabulary entries by (df, token) — so
  * the query is non-vacuous at every SF of the synthetic corpus (a fixed
  * absolute df floor is either vacuous or total on a 31-token shared
  * vocabulary). Production chooses either form; the plans differ only in
  * how the rare set reaches the token stream, see below.
  *
  * 100 TB shape: the df table is one vocabulary-keyed aggregation with
  * map-side partial aggregation (vocab-bounded, Zipf-sparse — the same
  * bound `llm_e4_term_frequencies` rides); the rank window runs over
  * that vocab-bounded frame, never corpus rows. The rank-k rare set is
  * k-bounded, so it BROADCASTS onto the exploded token stream; a
  * df-floor variant has an unbounded rare set and would swap the
  * broadcast for a token-keyed shuffle join — same plan otherwise.
  * Document reassembly is the one corpus-keyed shuffle
  * (groupBy(doc_id) + array_sort(collect_list(struct(pos, tok)))):
  * per-doc state is the document itself, so partial aggregation bounds
  * memory by document size, not corpus size.
  *
  * NULL text: `split(NULL)` explodes to zero rows in both engines, so a
  * null-text document drops out of the output entirely (reassembly has
  * nothing to rebuild) — consistent cross-engine by construction, unlike
  * the per-row projection ops which carry NULL through.
  */
object VocabPrune {

  private def docs(s: SparkSession, dir: String): DataFrame = T(s, dir, "documents")
  private def toks(text: Column): Column = split(text, " ", -1)

  /** Rank-form cut: the k rarest vocabulary entries by (df asc, token
    * asc) — the tie order makes the rare SET deterministic even when
    * the df histogram is flat at the boundary. */
  private[llmops] val pruneK = 5

  private val prune = GraftQuery(
    "llm_e4_mincount_prune",
    s"min-count vocabulary pruning: $pruneK rarest-df tokens -> <UNK> (E4)",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      tok AS (
        SELECT doc_id, pos, t[pos] AS tok
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS pos FROM t)),
      df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
      rare AS (
        SELECT tok FROM (
          SELECT tok, row_number() OVER (ORDER BY df, tok) AS rn FROM df)
        WHERE rn <= $pruneK),
      m AS (
        SELECT tok.doc_id, tok.pos,
               CASE WHEN rare.tok IS NULL THEN tok.tok ELSE '<UNK>' END AS mtok,
               CASE WHEN rare.tok IS NULL THEN 0 ELSE 1 END AS pruned1
        FROM tok LEFT JOIN rare ON tok.tok = rare.tok)
      -- ORDER BY (pos, mtok), not pos alone: a key-corrupted corpus
      -- (doc_id reused with a different payload) TIES pos across the
      -- variants with different tokens, and the engines' tie orders
      -- differ; the engine's struct sort is (pos, masked-token) too
      SELECT doc_id,
             string_agg(mtok, ' ' ORDER BY pos, mtok) AS pruned,
             CAST(SUM(pruned1) AS BIGINT) AS n_pruned
      FROM m
      GROUP BY doc_id
      ORDER BY doc_id"""),
    (s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos0", "tok")))
      // vocabulary df: distinct-per-doc then count — map-side partials
      // bound both shuffles by vocabulary x documents-per-task
      val df = tok.select(col("doc_id"), col("tok")).distinct()
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      // the rank window runs over the VOCAB-BOUNDED df table (31 rows at
      // test SF; Zipf-bounded in production), never corpus rows
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("df"), col("tok"))
      val rare = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= pruneK)
        .select(col("tok"), lit(true).as("is_rare"))
      tok
        .join(broadcast(rare), Seq("tok"), "left")
        .select(col("doc_id"), col("pos0"),
          when(col("is_rare"), lit("<UNK>")).otherwise(col("tok")).as("tok2"),
          when(col("is_rare"), lit(1L)).otherwise(lit(0L)).as("pruned1"))
        .groupBy(col("doc_id"))
        .agg(
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("pos0"), col("tok2")))),
              x => x.getField("tok2"))).as("pruned"),
          sum(col("pruned1")).as("n_pruned"))
        .orderBy(col("doc_id"))
    })

  def queries: Seq[GraftQuery] = Seq(prune)
}
