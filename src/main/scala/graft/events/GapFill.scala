package graft.events

import graft.{GraftQuery, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion operators over the events table (extension
  * family E5): dense time-spine gap-fill (every hour × every event type
  * present, zero-filled) and IGNORE-NULLS forward fill (carry the last
  * observed value down sparse rows) — the two primitives every metrics
  * warehouse needs before charting or rate math, and both absent from
  * the plain window surface covered so far (SURVEY §2.6 extensions).
  *
  * Timestamp discipline follows EventAnalytics: load through
  * `EventAnalytics.events` (ns→µs normalization) and emit hour buckets
  * as strings, never raw timestamps (DuckDB reads the column as
  * TIMESTAMP_NS; formatted strings agree across precisions).
  */
object GapFill {

  import T._

  /** Dense hourly spine: one row per (event_type, hour) over the full
    * observed range, zero-filled where no events landed. The spine is
    * built from a ONE-ROW bounds aggregate exploded through sequence()
    * — hours×types is calendar-bounded (720×5 per month), never
    * SF-scaled, so the grid side broadcasts at any scale; the SF-scaled
    * work (the hourly counts) is one partial+final aggregate shuffling
    * on (type, hour). Value sums use the exact-decimal discipline so
    * zero-fill and real sums hash identically in both engines.
    *
    * OPERATIONAL BOUND: "calendar-bounded" is a property of the DATA
    * WINDOW, not the plan — the spine spans MIN(ts)..MAX(ts), so one
    * wild-clock row widens it to centuries (measured on the round-12
    * extreme-timestamp gate: a 1677/2262 pair exploded the grid from
    * 17k to 25.6M rows; both engines still agreed, so this is a cost
    * hazard, not a correctness one). The declared defense is upstream:
    * the streaming quality gate's `ts_in_retention` rule
    * ([[graft.streaming.EventStreams.eventRules]]) quarantines
    * out-of-window clocks at ingest; spine operators consume gated
    * data by contract — and since round 13 the contract is loud
    * in-plan: [[graft.T.spineGuard]] raises a descriptive error from
    * the same 1-row bounds frame once the span exceeds
    * `graft.spine.maxHours`, so ungated wild-clock input fails fast
    * instead of silently materializing the grid (TimeExtremeSpec). */
  private val timeSpine = GraftQuery(
    "e5_time_spine_gapfill",
    "dense hour×type spine via sequence + left join, zero-filled (E5 §2.6)",
    Some(s"""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)),
      bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events),
      spine AS (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
      grid AS (
        SELECT t.event_type, s.hour
        FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN spine s)
      SELECT g.event_type, strftime(g.hour, '%Y-%m-%d %H:00') AS hour_bucket,
             COALESCE(h.n_events, 0) AS n_events,
             COALESCE(h.sum_value, CAST(0 AS DOUBLE)) AS sum_value
      FROM grid g LEFT JOIN hourly h
        ON g.event_type = h.event_type AND g.hour = h.hour
      ORDER BY g.event_type, hour_bucket"""),
    (s, dir) => {
      val events = EventAnalytics.events(s, dir)
      val hourly = events
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      val spine = events
        .agg(date_trunc("hour", min(col("ts"))).as("lo"),
          date_trunc("hour", max(col("ts"))).as("hi"))
        .select(explode(T.spineGuard(s, "e5_time_spine_gapfill",
          // integer `div`, not `/`: the µs difference of a wild
          // 1677..2262 window (~1.85e16) exceeds double's 53-bit
          // mantissa, and a rounded-then-truncated quotient could land
          // one hour low right at the cap boundary
          expr("(unix_micros(hi) - unix_micros(lo)) div 3600000000 + 1"),
          col("lo"), col("hi"),
          sequence(col("lo"), col("hi"), expr("interval 1 hour"))))
          .as("hour"))
      val grid = events.select(col("event_type")).distinct().crossJoin(spine)
      // hint the BUILD side: Spark cannot broadcast the preserved
      // (left) side of a left-outer join, so hinting `grid` would be
      // silently dropped; `hourly` is the aggregated, equally
      // dimension-bounded side (event-types × hours) and is the one
      // Spark can actually build a broadcast hash map from
      grid
        .join(broadcast(hourly), Seq("event_type", "hour"), "left")
        .select(col("event_type"),
          date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour_bucket"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("event_type", "hour_bucket")
    })

  /** IGNORE-NULLS forward fill: every event row carries the value of
    * the user's most recent purchase at that point in the stream
    * (NULL until the first purchase). One window per user_id — state
    * bounded per key, the partition key's cardinality scales with the
    * data, no global sort. Ordering ties on ts break on the unique
    * event_id in BOTH engines, and the filled value is carried
    * verbatim (no arithmetic), so the result is bit-deterministic. */
  private val forwardFill = GraftQuery(
    "e5_forward_fill",
    "last-purchase-value forward fill via IGNORE NULLS window (E5 §2.6)",
    Some("""
      -- value completes the total order (round 16): a same-ts corrupt
      -- copy (recomputed-value backfill double-commit) ties on
      -- (ts, event_id) with a DIFFERENT fill payload, and the last-pick
      -- among tied rows was stable-sort luck (the running-sum class,
      -- §2b-z). NULLS FIRST is explicit because the engines' ASC
      -- defaults differ (Spark first, DuckDB last) and a null-value
      -- copy's OWN fill row depends on its side of the tie.
      SELECT event_id, user_id, event_type,
        LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id, value ASC NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
      FROM events
      ORDER BY event_id"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"), col("value").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      EventAnalytics.events(s, dir)
        .withColumn("last_purchase_value",
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
            .over(w))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("last_purchase_value"))
        .orderBy("event_id")
    })

  def queries: Seq[GraftQuery] = Seq(timeSpine, forwardFill)
}
