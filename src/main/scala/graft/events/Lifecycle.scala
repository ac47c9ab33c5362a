package graft.events

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-lifecycle modeling over the events stream (extension family E5,
  * continued): SCD2 history construction and robust anomaly detection —
  * the "state over time" queries an analytics warehouse derives from an
  * append-only event log.
  *
  * Both queries key every wide edge (shuffle, window) on a
  * data-proportional column (`user_id`, `event_type`), never on a
  * constant — the posture that survives a 1000-executor scale-up.
  */
object Lifecycle {

  import EventAnalytics.events

  /** Slowly-changing-dimension (type 2) build: collapse each user's
    * per-day activity tier into [valid_from, valid_to] runs via the
    * gaps-and-islands pattern — `row_number() over (user)` minus
    * `row_number() over (user, tier)` is constant exactly while the
    * tier holds, so one hash aggregate over (user, tier, island) emits
    * the history rows. This is how a dimension table is derived from an
    * event log without a driver-side loop.
    *
    * Scale shape: one shuffle to (user_id, day) for the daily rollup,
    * then BOTH window functions and the final aggregate reuse the
    * user_id partitioning (Spark plans a single sort per user
    * partition; per-group window state is bounded by a user's day
    * count). Nothing global, nothing broadcast. */
  private val scd2 = GraftQuery(
    "e5_scd2_activity_tiers",
    "SCD2 user activity-tier history via gaps-and-islands (E5)",
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      tiered AS (
        SELECT user_id, day, n,
               CASE WHEN n >= 5 THEN 'high' WHEN n >= 2 THEN 'mid' ELSE 'low' END AS tier
        FROM daily),
      grp AS (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day)
                - row_number() OVER (PARTITION BY user_id, tier ORDER BY day) AS island
        FROM tiered)
      SELECT user_id, tier, MIN(day) AS valid_from, MAX(day) AS valid_to,
             COUNT(*) AS n_days, CAST(SUM(n) AS BIGINT) AS n_events
      FROM grp GROUP BY user_id, tier, island
      ORDER BY user_id, valid_from"""),
    (s, dir) => scd2Frame(s, dir)
      .orderBy(col("user_id"), col("valid_from")))

  /** The SCD2 history frame (unordered) — shared by the history query
    * and the point-in-time lookup. */
  private def scd2Frame(s: SparkSession, dir: String): DataFrame = {
    val daily = events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val tiered = daily.withColumn("tier",
      when(col("n") >= 5, "high").when(col("n") >= 2, "mid").otherwise("low"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val byTier = Window.partitionBy(col("user_id"), col("tier")).orderBy(col("day"))
    tiered
      .withColumn("island",
        row_number().over(byUser) - row_number().over(byTier))
      .groupBy(col("user_id"), col("tier"), col("island"))
      .agg(
        min(col("day")).as("valid_from"),
        max(col("day")).as("valid_to"),
        count(lit(1)).as("n_days"),
        sum(col("n")).as("n_events"))
      .select(col("user_id"), col("tier"), col("valid_from"), col("valid_to"),
        col("n_days"), col("n_events"))
  }

  /** Point-in-time dimension lookup: each purchase joined to the SCD2
    * tier run valid on its day — the lakehouse "fact joins the
    * dimension AS OF the event" pattern, here with the dimension derived
    * from the same log. A purchase day is by construction an active day,
    * and runs partition a user's active-day sequence into disjoint
    * calendar intervals, so every purchase matches EXACTLY one run
    * (LifecycleSpec asserts the bijection).
    *
    * Plan shape: equi join on user_id with the interval containment as a
    * residual filter — one co-partitioned shuffle; per-user run counts
    * are tier-change-bounded, never SF-scaled on one key. */
  private val pointInTime = GraftQuery(
    "e5_point_in_time_lookup",
    "purchases joined to the SCD2 tier valid at event time (E5 §2.3)",
    Some("""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      tiered AS (
        SELECT user_id, day, n,
               CASE WHEN n >= 5 THEN 'high' WHEN n >= 2 THEN 'mid' ELSE 'low' END AS tier
        FROM daily),
      grp AS (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day)
                - row_number() OVER (PARTITION BY user_id, tier ORDER BY day) AS island
        FROM tiered),
      hist AS (
        SELECT user_id, tier, MIN(day) AS valid_from, MAX(day) AS valid_to
        FROM grp GROUP BY user_id, tier, island),
      p AS (
        SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.day, h.tier
      FROM p JOIN hist h
        ON h.user_id = p.user_id AND p.day BETWEEN h.valid_from AND h.valid_to
      ORDER BY p.event_id"""),
    (s, dir) => {
      val hist = scd2Frame(s, dir)
        .select(col("user_id").as("h_user"), col("tier"),
          col("valid_from"), col("valid_to"))
      events(s, dir).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"))
        .join(hist,
          col("user_id") === col("h_user") &&
            col("day").between(col("valid_from"), col("valid_to")))
        .select(col("event_id"), col("user_id"), col("day"), col("tier"))
        .orderBy(col("event_id"))
    })

  /** Robust daily-volume anomaly flags per event type: median + MAD
    * (median absolute deviation) instead of mean + stddev, so a burst
    * day cannot drag the threshold toward itself. Exact medians via the
    * `percentile`/`quantile_cont` pair already proven bit-compatible by
    * `q_exact_percentiles`; the deviation chain is a fixed order of
    * double ops, hash-identical cross-engine.
    *
    * Scale shape: the daily rollup shuffles on (event_type, day); both
    * median aggregates are keyed by event_type (NOT a global
    * percentile) and their outputs are |event_type|-row frames,
    * broadcast back onto the daily table. The exact per-group
    * percentile holds one group's day-counts in memory — bounded by
    * days-per-type, not data volume; at unbounded group width the
    * approx_percentile twin is the documented fallback. */
  private val anomalyMad = GraftQuery(
    "e5_daily_anomaly_mad",
    "median/MAD robust daily-volume anomaly flags per event type (E5)",
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      med AS (
        SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY event_type),
      dev AS (
        SELECT d.event_type, d.day, d.n, m.med, ABS(d.n - m.med) AS adev
        FROM daily d JOIN med m USING (event_type)),
      madt AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type)
      SELECT dev.event_type, dev.day, dev.n, dev.med, madt.mad,
             (dev.adev > 3.0 * madt.mad) AS is_anomaly
      FROM dev JOIN madt USING (event_type)
      ORDER BY event_type, day"""),
    (s, dir) => {
      val daily = events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.groupBy(col("event_type"))
        .agg(expr("percentile(n, 0.5D)").as("med"))
      val dev = daily
        .join(broadcast(med), "event_type") // |event_type| rows
        .withColumn("adev", abs(col("n") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(adev, 0.5D)").as("mad"))
      dev
        .join(broadcast(mad), "event_type")
        .select(col("event_type"), col("day"), col("n"), col("med"), col("mad"),
          (col("adev") > lit(3.0) * col("mad")).as("is_anomaly"))
        .orderBy(col("event_type"), col("day"))
    })

  def queries: Seq[GraftQuery] = Seq(scd2, pointInTime, anomalyMad)
}
