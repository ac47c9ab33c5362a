package graft.events

import graft.GraftQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Marketing-style revenue attribution (extension family E5, continued):
  * each purchase's value is split equally across the same user's clicks
  * in the 7 days up to the purchase (linear multi-touch attribution).
  *
  * Scale notes: the purchase×click match is an equi-join on user_id with
  * a time-range residual — one co-partitioned shuffle; per-user event
  * counts are activity-bounded, never SF-front-loaded onto one key. The
  * per-purchase touch count is a window partitioned by purchase id
  * (bounded groups), and the per-click rollup is one partial/final
  * aggregate. Shares quantize to exact integers (value/n × 1e8
  * TRUNCATED — truncation has no rounding ties, so the quantities are
  * bit-identical cross-engine where a decimal cast of a computed double
  * is not) and sum exactly, so the attributed totals are
  * order-insensitive and conservation — attributed total ==
  * quantized-share total — holds exactly (AttributionSpec).
  */
object Attribution {

  private val linearAttribution = GraftQuery(
    "e5_linear_attribution",
    "linear multi-touch revenue attribution: purchase value split over prior-7d clicks (E5)",
    Some("""
      WITH p AS (
        SELECT user_id AS u, event_id AS p_id, ts AS p_ts, value
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id AS cu, event_id AS c_id, ts AS c_ts
        FROM events WHERE event_type = 'click'),
      m AS (
        SELECT p.*, c.c_id
        FROM p JOIN c ON c.cu = p.u
         AND c.c_ts <= p.p_ts
         AND c.c_ts > p.p_ts - INTERVAL 7 DAY),
      shared AS (
        SELECT u, c_id, p_id,
               CAST(trunc(value / (COUNT(*) OVER (PARTITION BY p_id)) * 1e8)
                    AS DECIMAL(20,0)) AS share_q
        FROM m)
      SELECT u AS user_id, c_id AS click_event_id,
             CAST(SUM(share_q) AS DOUBLE) / 1e8 AS attributed,
             COUNT(DISTINCT p_id) AS n_purchases
      FROM shared
      GROUP BY u, c_id
      ORDER BY user_id, click_event_id"""),
    (s, dir) => {
      val ev = EventAnalytics.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("event_id").as("p_id"),
          col("ts").as("p_ts"), col("value"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      p.join(c,
          col("cu") === col("u") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") > col("p_ts") - expr("INTERVAL 7 DAY"))
        // double->long cast truncates toward zero, matching trunc()
        .withColumn("share_q",
          (col("value") / count(lit(1)).over(Window.partitionBy(col("p_id"))) * 1e8)
            .cast("long").cast(DecimalType(20, 0)))
        .groupBy(col("u"), col("c_id"))
        .agg(
          (sum(col("share_q")).cast("double") / 1e8).as("attributed"),
          countDistinct(col("p_id")).as("n_purchases"))
        .select(col("u").as("user_id"), col("c_id").as("click_event_id"),
          col("attributed"), col("n_purchases"))
        .orderBy(col("user_id"), col("click_event_id"))
    })

  def queries: Seq[GraftQuery] = Seq(linearAttribution)
}
