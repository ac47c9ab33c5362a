package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.functions._

/** Subquery shapes (extension family E6, §2.3): correlated EXISTS,
  * correlated scalar subquery, and NOT IN — expressed Spark-first as the
  * joins Catalyst would decorrelate them into (left-semi, agg-then-join,
  * left-anti), with the oracle spelled in subquery form. Writing the
  * decorrelated plan directly (instead of SQL subqueries) keeps the
  * shuffle structure explicit: one hash aggregate + one shuffled join
  * each, no nested-loop re-execution per outer row — the property that
  * makes these shapes survive 100 TB.
  */
object Subqueries {

  import T._

  /** TPC-H Q4 shape — correlated EXISTS: orders in a quarter with at
    * least one lineitem shipped >60 days after the order date, counted
    * per priority. Spark: left-semi join (EXISTS ≡ semi), condition
    * pushed into the join so each order matches at most once — no
    * post-join distinct needed. */
  private val existsQ = GraftQuery(
    "q_exists_subquery",
    "correlated EXISTS as left-semi join, per-priority counts (E6 §2.3)",
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders o
      WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) => {
      val li = T(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      T(s, dir, "orders")
        .join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    })

  /** TPC-H Q17 shape — correlated scalar subquery: lineitems below 20%
    * of their part's average quantity. Spark: aggregate-then-join (the
    * decorrelation); the per-part average is computed ONCE over the
    * fact table, not per outer row. Quantities are integral doubles, so
    * sum/avg are exact in FP regardless of order — the < threshold
    * compare cannot flip between engines. */
  private val scalarQ = GraftQuery(
    "q_scalar_subquery",
    "correlated scalar subquery as agg-then-join (E6 §2.3)",
    Some(s"""
      SELECT ${sqlDec2Dbl(s"SUM(${sqlMoney("l_extendedprice")})")} AS total_price,
             COUNT(*) AS n_items
      FROM lineitem l
      WHERE l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem
        WHERE l_partkey = l.l_partkey)"""),
    (s, dir) => {
      val li = T(s, dir, "lineitem")
      val partAvg = li.groupBy(col("l_partkey").as("pk"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(partAvg, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          sum(money("l_extendedprice")).cast("double").as("total_price"),
          count(lit(1)).as("n_items"))
    })

  /** NOT IN over a non-nullable key — parts never ordered in bulk
    * (quantity ≥ 49). With a provably non-null key NOT IN ≡ left-anti
    * join; a nullable key would instead need the three-valued-logic
    * null-aware anti join (Spark plans that automatically from SQL NOT
    * IN, at the cost of a broadcast). */
  private val notInQ = GraftQuery(
    "q_not_in_subquery",
    "NOT IN over non-null key as left-anti join, per-brand counts (E6 §2.3)",
    Some("""
      SELECT p_brand, COUNT(*) AS n_parts
      FROM part
      WHERE p_partkey NOT IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      GROUP BY p_brand
      ORDER BY p_brand"""),
    (s, dir) => {
      val bulk = T(s, dir, "lineitem")
        .filter(col("l_quantity") >= 49)
        .select(col("l_partkey"))
      T(s, dir, "part")
        .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    })

  def queries: Seq[GraftQuery] = Seq(existsQ, scalarQ, notInQ)
}
