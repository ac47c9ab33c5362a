package graft.events

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling / overlapping time-window analytics (extension family E5,
  * continued): engagement streaks, sliding-window traffic, and rolling
  * distinct-user reach — the three "how sticky is usage" questions every
  * event warehouse answers on top of the raw log (reference analog: the
  * dashboard's per-day aggregates in /root/reference/gui.py are the
  * non-overlapping special case of all three).
  *
  * Scale notes common to the family: every query here shuffles on keys
  * whose cardinality scales with data (user_id, day, window start) —
  * never a global sort; overlap is materialized as a BOUNDED fan-out
  * (x4 for the sliding windows, x7 for the weekly reach), which is the
  * standard trade that turns a self-join-per-window into one shuffle.
  */
object Rolling {

  import EventAnalytics.events

  private val epoch = "2024-01-01" // any fixed anchor; only differences matter

  /** Gaps-and-islands: maximal runs of CONSECUTIVE active days per user.
    *
    * The classic technique: for each user's distinct active days in
    * order, `datediff(day, anchor) - row_number()` is constant within a
    * consecutive run and strictly increases across gaps, so grouping by
    * that constant materializes the islands without any self-join. The
    * window partitions by user_id (data-proportional key); islands are
    * then a user-bounded aggregate. The longest-streak tie-break
    * (earliest start wins) is a second tiny aggregate over the islands
    * frame — never a re-scan of the events.
    */
  private val streaks = GraftQuery(
    "e5_activity_streaks",
    "per-user maximal consecutive-active-day streaks via gaps-and-islands (E5)",
    Some(s"""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      isl AS (
        SELECT user_id, day,
               date_diff('day', DATE '$epoch', day)
                 - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM days),
      islands AS (
        SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS s_start
        FROM isl GROUP BY user_id, grp),
      per_user AS (
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
               COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak_days
        FROM islands GROUP BY user_id)
      SELECT p.user_id, p.n_active_days, p.n_streaks, p.max_streak_days,
             strftime(MIN(i.s_start), '%Y-%m-%d') AS best_streak_start
      FROM per_user p
      JOIN islands i ON i.user_id = p.user_id AND i.len = p.max_streak_days
      GROUP BY p.user_id, p.n_active_days, p.n_streaks, p.max_streak_days
      ORDER BY p.user_id"""),
    (s, dir) => {
      val days = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = days
        .withColumn("grp",
          datediff(col("day"), lit(epoch).cast("date")) - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("s_start"))
      val perUser = islands.groupBy(col("user_id"))
        .agg(
          sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(col("len")).as("max_streak_days"))
      // earliest start among the longest islands: join back on (user, len)
      // — the islands frame is at most one row per active day, so this is
      // a user-keyed join between two already-aggregated frames; the
      // island side is renamed first so the self-lineage join keys can't
      // resolve to the same attribute (Spark's ambiguous-self-join trap)
      val best = islands.select(
        col("user_id").as("b_user"), col("len").as("b_len"), col("s_start"))
      perUser
        .join(best,
          col("b_user") === col("user_id") && col("b_len") === col("max_streak_days"))
        .groupBy(col("user_id"), col("n_active_days"), col("n_streaks"),
          col("max_streak_days"))
        .agg(date_format(min(col("s_start")), "yyyy-MM-dd").as("best_streak_start"))
        .orderBy(col("user_id"))
    })

  /** Overlapping sliding windows: event counts + distinct users per
    * 1-hour window sliding every 15 minutes — the batch twin of Spark's
    * `window(ts, "1 hour", "15 minutes")` (Structured Streaming assigns
    * each event to the same 4 windows; the streaming variant is spec'd
    * in EventStreamsSpec against this formulation).
    *
    * Spark materializes the window/slide overlap as a 4-way Expand
    * before the aggregate — bounded fan-out, then one shuffle keyed by
    * window start (cardinality = time span / slide, scales with time,
    * not volume). The oracle spells the same assignment out explicitly:
    * each event belongs to windows starting at floor15(ts) - k*15min,
    * k in 0..3. */
  private val slidingCounts = GraftQuery(
    "e5_sliding_window_counts",
    "1h windows sliding 15min: counts + distinct users per overlapping window (E5)",
    Some(s"""
      WITH assigned AS (
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k * (INTERVAL '15 minutes') AS w_start,
               user_id, value
        FROM events, generate_series(0, 3) AS g(k))
      SELECT strftime(w_start, '%Y-%m-%d %H:%M') AS window_start,
             COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users,
             round(${graft.T.sqlDsum("value")}, 2) AS sum_value
      FROM assigned
      GROUP BY w_start ORDER BY w_start"""),
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          round(graft.T.dsum(col("value")), 2).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("n_events"), col("n_users"), col("sum_value"))
        .orderBy(col("window_start")))

  /** Rolling 7-day distinct users (DAU/WAU) on a dense day spine.
    *
    * The scalable rolling-distinct trick: a naive formulation joins the
    * day spine to a 7-day range of events (a range self-join that
    * re-reads each event 7 times from a shuffle); instead each distinct
    * (user, day) CONTRIBUTES itself to the 7 day-buckets it can be seen
    * from — a bounded x7 explode of an already-deduplicated frame —
    * and each bucket then counts distinct contributors with one
    * day-keyed shuffle. For wider windows (e.g. 90-day MAU at 100 TB)
    * the same plan holds with x90 fan-out of the (user, day) frame,
    * which is already orders of magnitude smaller than the raw events;
    * beyond that the approximate path is `e5_sketch_aggregates`'s HLL.
    * The day spine derives from a 1-row min/max aggregate, broadcast —
    * no driver-side collect. */
  private val rollingReach = GraftQuery(
    "e5_rolling_dau_wau",
    "rolling 7-day distinct users via contribution-explode over the (user, day) frame (E5)",
    Some(s"""
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      spine AS (
        SELECT CAST(unnest(generate_series(MIN(day), MAX(day), INTERVAL '1 day')) AS DATE) AS day
        FROM ud),
      contrib AS (
        SELECT user_id, day + k * (INTERVAL '1 day') AS bucket
        FROM ud, generate_series(0, 6) AS g(k)),
      wau AS (
        SELECT CAST(bucket AS DATE) AS day, COUNT(DISTINCT user_id) AS wau
        FROM contrib GROUP BY 1),
      dau AS (
        SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
      SELECT strftime(s.day, '%Y-%m-%d') AS day,
             COALESCE(d.dau, 0) AS dau,
             COALESCE(w.wau, 0) AS wau,
             ${graft.T.quantizeSql("CAST(COALESCE(d.dau, 0) AS DOUBLE) / COALESCE(w.wau, 1)", "10000.0")} AS stickiness
      FROM spine s
      LEFT JOIN dau d ON d.day = s.day
      LEFT JOIN wau w ON w.day = s.day
      ORDER BY s.day"""),
    (s, dir) => {
      val ud = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      // day spine: same MIN/MAX-derived shape as e5_time_spine_gapfill,
      // same wild-clock hazard (one epoch-0 row widens it by decades),
      // same in-plan backstop — span expressed in hours so one conf
      // (graft.spine.maxHours) bounds every spine-shaped op
      val spine = ud
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(graft.T.spineGuard(s, "e5_rolling_dau_wau",
          (datediff(col("d1"), col("d0")).cast("long") + lit(1L)) * lit(24L),
          col("d0"), col("d1"),
          expr("sequence(d0, d1, interval 1 day)"))).as("day"))
      val wau = ud
        .select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("bucket"))
        .groupBy(col("bucket").as("day"))
        .agg(countDistinct(col("user_id")).as("wau"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      spine
        .join(dau, Seq("day"), "left")
        .join(wau, Seq("day"), "left")
        .select(
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("dau"), lit(0L)).as("dau"),
          coalesce(col("wau"), lit(0L)).as("wau"),
          graft.T.quantize(coalesce(col("dau"), lit(0L)).cast("double") /
            coalesce(col("wau"), lit(1L)), 10000.0).as("stickiness"))
        .orderBy(col("day"))
    })

  def queries: Seq[GraftQuery] = Seq(streaks, slidingCounts, rollingReach)
}
