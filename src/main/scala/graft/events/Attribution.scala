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
    Some(s"""
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
               CASE WHEN ${graft.T.sqlMoneyRange("value")} THEN value END
                 / (COUNT(*) OVER (PARTITION BY p_id)) * 1e8 AS s
        FROM m),
      q AS (
        SELECT u, c_id, p_id,
               CASE WHEN abs(s) < 9007199254740992
                    THEN CAST((s - (s % 1.0)) AS DECIMAL(38,0)) END AS share_q
        FROM shared)
      SELECT u AS user_id, c_id AS click_event_id,
             CAST(CAST((SUM(share_q)) AS VARCHAR) AS DOUBLE) / 1e8 AS attributed,
             COUNT(DISTINCT p_id) AS n_purchases
      FROM q
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
        // `s - (s % 1.0)` truncates toward zero in identical double ops
        // on both engines (the T.quantize discipline), and the result is
        // an INTEGRAL double. The decimal cast of that double is exact
        // on both engines ONLY below 2^53: integral doubles < 2^53
        // round-trip through decimal digits uniquely, while past 2^53
        // Spark's cast routes through Double.toString (shortest
        // round-trip digits) where DuckDB expands the exact binary
        // value — e.g. 2^60 renders 1152921504606847000 in Spark vs
        // 1152921504606846976 in DuckDB. So the quantized-share domain
        // is |s| < 2^53 (share magnitude < ~9e7 after the 1e8 scale);
        // a share beyond it is MISSING exactly like a value outside
        // T.moneyRange (non-finite / past decimal money capacity):
        // NULL share, skipped by the sum, while the purchase still
        // counts toward n_purchases. The previous long-quantization
        // overflowed past 9.2e10; the bare decimal cast diverged past
        // 9e7 — this bound closes the whole ladder (NonFiniteInputSpec).
        .withColumn("s",
          when(graft.T.moneyRange(col("value")), col("value"))
            / count(lit(1)).over(Window.partitionBy(col("p_id"))) * 1e8)
        .withColumn("share_q",
          when(abs(col("s")) < lit(9007199254740992d),
            (col("s") - (col("s") % lit(1.0))).cast(DecimalType(38, 0))))
        .groupBy(col("u"), col("c_id"))
        .agg(
          (sum(col("share_q")).cast("double") / 1e8).as("attributed"),
          countDistinct(col("p_id")).as("n_purchases"))
        .select(col("u").as("user_id"), col("c_id").as("click_event_id"),
          col("attributed"), col("n_purchases"))
        .orderBy(col("user_id"), col("click_event_id"))
    })

  /** Time-to-convert: for every click, the delay to the user's FIRST
    * purchase at-or-after it ([[graft.operators.AsOfJoin.forward]] —
    * completing the backward/forward/nearest direction family), counted
    * as converted when within 7 days; one summary row with the exact
    * delay percentiles. The conversion-latency distribution is the
    * funnel metric product teams actually page on.
    *
    * Scale notes: the forward as-of is the same one-shuffle union+window
    * as backward — never a pairs join (the oracle's LEFT JOIN + MIN
    * spell-out is the O(pairs) formulation the engine avoids). The
    * percentile aggregate holds the delay vector of converted clicks —
    * bounded by conversion volume; the documented fallback at unbounded
    * width is approx_percentile (q_approx_quantile_audit licenses it).
    * Delays are integer micros, so `percentile`'s dyadic interpolation
    * is FP-exact cross-engine (the q_exact_percentiles discipline).
    */
  private val timeToConvert = GraftQuery(
    "e5_time_to_convert",
    "click -> first-purchase-within-7d delay percentiles via forward as-of (E5)",
    Some("""
      WITH c AS (
        SELECT user_id AS u, event_id AS c_id, ts AS c_ts
        FROM events WHERE event_type = 'click'),
      p AS (
        SELECT user_id AS pu, ts AS p_ts
        FROM events WHERE event_type = 'purchase'),
      m AS (
        -- per DISTINCT click; re-joined onto c below so duplicate-KEY
        -- click copies (tenth axis, round 15) each count one row, the
        -- way the engine's per-left-row forward as-of does
        SELECT cd.u, cd.c_id, cd.c_ts, MIN(p.p_ts) AS p_ts
        FROM (SELECT DISTINCT u, c_id, c_ts FROM c) cd
        LEFT JOIN p ON p.pu = cd.u AND p.p_ts >= cd.c_ts
        GROUP BY cd.u, cd.c_id, cd.c_ts),
      d AS (
        SELECT CASE WHEN m.p_ts IS NOT NULL
                     AND epoch_us(m.p_ts) - epoch_us(c.c_ts) <= 604800000000
                    THEN epoch_us(m.p_ts) - epoch_us(c.c_ts) END AS delay_us
        -- null-safe: a click with NULL user/event/ts still counts one
        -- row (the DISTINCT above groups NULLs together, and the
        -- engine's per-left-row forward as-of counts every click row;
        -- plain = would silently exclude NULL-key clicks in n_clicks)
        FROM c JOIN m ON c.u IS NOT DISTINCT FROM m.u
                     AND c.c_id IS NOT DISTINCT FROM m.c_id
                     AND c.c_ts IS NOT DISTINCT FROM m.c_ts)
      SELECT COUNT(*) AS n_clicks,
             COUNT(delay_us) AS n_converted,
             CAST(COUNT(delay_us) AS DOUBLE) / NULLIF(COUNT(*), 0) AS conversion_rate,
             quantile_cont(delay_us, 0.25) AS p25_us,
             quantile_cont(delay_us, 0.50) AS p50_us,
             quantile_cont(delay_us, 0.75) AS p75_us,
             quantile_cont(delay_us, 0.90) AS p90_us
      FROM d"""),
    (s, dir) => {
      val ev = EventAnalytics.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id")
      val purchases = ev.filter(col("event_type") === "purchase")
        .withColumn("p_ts", col("ts"))
        .select("user_id", "ts", "event_id", "p_ts")
      graft.operators.AsOfJoin
        .forward(clicks, purchases, "user_id", "ts", "event_id", Seq("p_ts"))
        .withColumn("delay_us",
          when(col("p_ts").isNotNull &&
            unix_micros(col("p_ts")) - unix_micros(col("ts")) <= 604800000000L,
            unix_micros(col("p_ts")) - unix_micros(col("ts"))))
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("delay_us")).as("n_converted"),
          // NULL on zero clicks (empty input) rather than ANSI 0/0 —
          // NULLIF in the oracle keeps the engines aligned (safeDiv
          // discipline); unreachable on non-empty events, load-bearing
          // for the empty-input sweep
          when(count(lit(1)) === 0, lit(null).cast("double"))
            .otherwise(count(col("delay_us")).cast("double") / count(lit(1)))
            .as("conversion_rate"),
          expr("percentile(delay_us, 0.25)").as("p25_us"),
          expr("percentile(delay_us, 0.50)").as("p50_us"),
          expr("percentile(delay_us, 0.75)").as("p75_us"),
          expr("percentile(delay_us, 0.90)").as("p90_us"))
    })

  def queries: Seq[GraftQuery] = Seq(linearAttribution, timeToConvert)
}
