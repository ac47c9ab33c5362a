package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** Typed-`Aggregator` (UDAF) queries — SURVEY §2.12's user-defined
  * aggregate surface, exercised through the same oracle gate as the
  * built-in operators.
  */
object TypedAgg {

  /** Top-3 line items by extended price per supplier nation, computed
    * with the k-bounded [[graft.functions.TopKAgg]] instead of a window
    * sort.
    *
    * Plan shape: nation broadcasts onto the fact scan (25 rows at any
    * SF); supplier is SF-SCALED so its join is left to AQE/statistics —
    * a forced broadcast would OOM executors at large SF (the repo's
    * standing broadcast rule). Then ONE partial/final aggregate whose
    * buffers are k-bounded — the shuffle carries ≤ 25 nations × 3 rows
    * per map partition, not the 600k scored rows the equivalent
    * `q_window_topk_per_group` plan shuffles and sorts. The oracle spells
    * the same semantics as the window formulation, which is exactly the
    * point: identical results, structurally cheaper plan.
    *
    * Ties: (score DESC, item_id ASC) is a total order because item_id
    * (orderkey×10+linenumber) is unique per row.
    */
  private val topkTypedAgg = GraftQuery(
    "q_topk_typed_agg",
    "top-3 items per nation via k-bounded typed Aggregator UDAF (§2.12; vs window sort)",
    Some("""
      WITH scored AS (
        SELECT n_name,
               l_extendedprice AS score,
               l_orderkey * 10 + l_linenumber AS item_id
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey),
      ranked AS (
        SELECT n_name, score, item_id,
               ROW_NUMBER() OVER (PARTITION BY n_name
                                  ORDER BY score DESC, item_id) AS rnk
        FROM scored)
      SELECT n_name AS nation, rnk AS rank, score, item_id
      FROM ranked WHERE rnk <= 3
      ORDER BY nation, rank"""),
    (s, dir) => {
      val lineitem = T(s, dir, "lineitem")
      val supplier = T(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val nation = T(s, dir, "nation").select("n_nationkey", "n_name")
      val topk = TopKAgg.udaf(3)
      lineitem
        .join(supplier, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .select(
          col("n_name").as("nation"),
          col("l_extendedprice").as("score"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("item_id"))
        .groupBy(col("nation"))
        .agg(topk(col("score"), col("item_id")).as("top"))
        .select(col("nation"), posexplode(col("top")).as(Seq("pos", "item")))
        .select(
          col("nation"),
          (col("pos") + 1).cast("long").as("rank"),
          col("item.score").as("score"),
          col("item.id").as("item_id"))
        .orderBy(col("nation"), col("rank"))
    })

  def queries: Seq[GraftQuery] = Seq(topkTypedAgg)
}
