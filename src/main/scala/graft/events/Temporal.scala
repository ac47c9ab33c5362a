package graft.events

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval / sequence analytics over the events stream (extension family
  * E5, continued): peak-concurrency timelines and Markov transition
  * matrices — the "how loaded is the system" and "where do users go next"
  * questions an event warehouse answers from the same sessionized log.
  *
  * The concurrency query is the showcase for the two-phase prefix-sum
  * pattern (same design as `llm_e4_shuffle_pack`): a running sum over a
  * GLOBAL time order is the textbook formulation and the textbook 100 TB
  * scale killer (one task sorts everything). Here the global prefix sum
  * is decomposed into (a) per-hour partial sums — a tiny frame, one row
  * per hour — cumulated once and broadcast, plus (b) within-hour running
  * sums over a window PARTITIONED by hour. Identical result, no global
  * sort; the only single-partition window runs over |hours| rows, which
  * grows with the time span, not the data volume.
  */
object Temporal {

  import EventAnalytics.events

  /** Sessionized events with (user_id, session_id, ts, event_id,
    * event_type) — the shared gap-based session assignment (>30 min
    * silence starts a new session), tie-broken by event_id so every
    * downstream ordering is total. */
  private[events] def sessionized(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("new_session",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
  }

  /** Shared oracle CTE: sessionization identical to `e5_sessionization`. */
  private[events] val sessionSql = """
      flagged AS (
        SELECT user_id, ts, event_id, event_type,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts, event_id, event_type,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )"""

  /** Peak concurrent sessions per hour via the two-phase prefix sum.
    *
    * Each session contributes a +1 delta at its start and a -1 at its
    * end; the running sum of deltas in (ts, delta DESC, user_id,
    * session_id) order — starts before ends at the same instant, then a
    * unique key so the prefix is a total order — IS the number of
    * concurrently open sessions. The oracle computes exactly that global
    * running sum; the Spark plan computes the same values as
    * `hour_offset + within-hour running sum`, where the hour offsets are
    * the cumulated per-hour delta sums (a |hours|-row frame, broadcast).
    * Every row-proportional edge (the session rollup, the delta window)
    * is keyed by user_id or hour — nothing global scales with data. */
  private val peakConcurrency = GraftQuery(
    "e5_peak_concurrency",
    "peak concurrent sessions per hour; global running sum decomposed into broadcast hour offsets + per-hour windows (E5)",
    Some(s"""
      WITH $sessionSql,
      sess AS (
        SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM sessions GROUP BY user_id, session_id),
      deltas AS (
        SELECT user_id, session_id, s_start AS ts, 1 AS delta FROM sess
        UNION ALL
        SELECT user_id, session_id, s_end AS ts, -1 AS delta FROM sess),
      run AS (
        SELECT ts, delta,
          SUM(delta) OVER (ORDER BY ts, delta DESC, user_id, session_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        FROM deltas)
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
             CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
             CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
             CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
      FROM run GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val sess = sessionized(s, dir)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      // ±1 deltas via a 2-element GENERATOR, not a self-union: the union
      // spelling references `sess` twice, and Spark re-executes the whole
      // sessionize→aggregate pipeline per branch (only the bottom shuffle
      // is reused) — one explode emits both rows from ONE session-rollup
      // pass. Same rows, same types; r19 A/B at sf0.1: 3.0-3.6 s → 2.2-2.8 s,
      // identical output. At scale this halves the session-frame passes
      // feeding the delta stream.
      val deltas = sess
        .select(col("user_id"), col("session_id"),
          explode(array(
            struct(col("s_start").as("ts"), lit(1).as("delta")),
            struct(col("s_end").as("ts"), lit(-1).as("delta")))).as("e"))
        .select(col("user_id"), col("session_id"),
          col("e.ts").as("ts"), col("e.delta").as("delta"))
        .withColumn("hour", date_trunc("hour", col("ts")))
      // phase 1: per-hour partial sums — one row per hour, so the single
      // ORDER BY hour window below runs over a time-span-sized frame
      // (thousands of rows for years of data), never the event volume
      val wHours = Window.orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = deltas
        .groupBy(col("hour")).agg(sum(col("delta")).as("h_sum"))
        .withColumn("offset", coalesce(sum(col("h_sum")).over(wHours), lit(0L)))
        .select(col("hour"), col("offset"))
      // phase 2: within-hour running sums, partitioned by hour — the
      // data-proportional window is keyed on a column whose cardinality
      // scales with the time range, so no task sees more than an hour
      val wInHour = Window.partitionBy(col("hour"))
        .orderBy(col("ts"), col("delta").desc, col("user_id"), col("session_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .join(broadcast(offsets), "hour")
        .withColumn("conc", col("offset") + sum(col("delta")).over(wInHour))
        .groupBy(date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour_bucket"))
        .agg(
          max(col("conc")).cast("long").as("peak_concurrency"),
          sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"),
          sum(when(col("delta") === -1, 1L).otherwise(0L)).as("n_ends"))
        .orderBy(col("hour_bucket"))
    })

  /** Within-session event-type transition matrix (first-order Markov):
    * count each adjacent (from → to) pair, then the per-from transition
    * probability as ONE division of exact integer counts — no
    * floating-point accumulation, so the doubles are bit-identical
    * cross-engine.
    *
    * Scale shape: the lead() window reuses the (user_id) sessionization
    * partitioning; pair counting shuffles on (from, to) — bounded by
    * |event_type|² groups; the per-from totals derive from the pair
    * counts (|event_type|² rows, NOT a second pass over the events) and
    * broadcast back. One event-volume-proportional shuffle total. */
  private val transitions = GraftQuery(
    "e5_event_transitions",
    "within-session event-type Markov transition counts + probabilities (E5)",
    Some(s"""
      WITH $sessionSql,
      pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id, session_id
                 ORDER BY ts, event_id) AS to_type
        FROM sessions),
      cnt AS (
        SELECT from_type, to_type, COUNT(*) AS n_pairs
        FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      tot AS (
        SELECT from_type, CAST(SUM(n_pairs) AS BIGINT) AS n_from
        FROM cnt GROUP BY from_type)
      SELECT c.from_type, c.to_type, c.n_pairs, t.n_from,
             CAST(c.n_pairs AS DOUBLE) / t.n_from AS p
      FROM cnt c JOIN tot t USING (from_type)
      ORDER BY from_type, to_type"""),
    (s, dir) => {
      val wSess = Window.partitionBy(col("user_id"), col("session_id"))
        .orderBy(col("ts"), col("event_id"))
      val cnt = sessionized(s, dir)
        .select(
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(wSess).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_pairs"))
      val tot = cnt.groupBy(col("from_type"))
        .agg(sum(col("n_pairs")).as("n_from"))
      cnt
        .join(broadcast(tot), "from_type") // |event_type| rows
        .withColumn("p", col("n_pairs").cast("double") / col("n_from"))
        .select(col("from_type"), col("to_type"), col("n_pairs"), col("n_from"), col("p"))
        .orderBy(col("from_type"), col("to_type"))
    })

  def queries: Seq[GraftQuery] = Seq(peakConcurrency, transitions)
}
