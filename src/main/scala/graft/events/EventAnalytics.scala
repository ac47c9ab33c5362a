package graft.events

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics in batch form (SURVEY.md §2.11 E5): time
  * bucketing, sessionization, funnel, semi-structured props extraction.
  * The same logic runs incrementally in graft.streaming over
  * `readStream` (see EventStreams); these batch forms are the
  * oracle-checkable twins.
  *
  * Scale posture: sessionization partitions by user_id — the natural
  * shuffle key; state per user is bounded by that user's events, so the
  * plan holds at 100 TB as long as no single user dominates (skew →
  * AQE skew-join handles the join case; for windows, a salted two-phase
  * variant would be the escape hatch).
  */
object EventAnalytics {

  import T._

  /** events.ts has shipped as parquet timestamp[ns] (surfacing as
    * LongType nanos under spark.sql.legacy.parquet.nanosAsLong) and as
    * timestamp[us] with isAdjustedToUTC=false (surfacing as
    * TIMESTAMP_NTZ) across driver testdata generations. Since round 11
    * the normalization to TimestampType lives in [[graft.T.canonical]]
    * — every driver table is contract-normalized at the read, and the
    * timestamp casts assert the UTC session they are only valid under.
    * DuckDB reads the same column natively; oracle SQL never emits raw
    * timestamps — only date_format strings and epoch bigints, which
    * agree across representations. */
  def events(s: SparkSession, dir: String): DataFrame = T(s, dir, "events")

  /** Hourly tumbling buckets via Spark's window() generator. */
  private val hourly = GraftQuery(
    "e5_hourly_event_stats",
    "tumbling 1-hour window agg over events (E5/§2.10 batch twin)",
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
        event_type,
        COUNT(*) AS n_events,
        ${sqlDsum("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_bucket"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("hour_bucket", "event_type"))

  /** Gap-based sessionization: a >30 min silence starts a new session.
    * Two stacked windows: lag() to flag session starts, running sum to
    * assign session ids, then per-user rollup. */
  private val sessionize = GraftQuery(
    "e5_sessionization",
    "lag + cumulative-sum session assignment, per-user rollup (E5)",
    Some(s"""
      WITH ${Temporal.sessionSql}
      SELECT user_id,
        CAST(MAX(session_id) AS BIGINT) AS n_sessions,
        COUNT(*) AS n_events
      FROM sessions
      GROUP BY user_id
      ORDER BY user_id"""),
    (s, dir) =>
      Temporal.sessionized(s, dir)
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id"))

  /** Per-session stats → histogram of session sizes. */
  private val sessionHistogram = GraftQuery(
    "e5_session_size_histogram",
    "two-level aggregation: session stats then distribution (E5/A3 shape)",
    Some(s"""
      WITH ${Temporal.sessionSql}, per_session AS (
        SELECT user_id, session_id, COUNT(*) AS session_events
        FROM sessions GROUP BY user_id, session_id
      )
      SELECT session_events, COUNT(*) AS n_sessions
      FROM per_session
      GROUP BY session_events
      ORDER BY session_events"""),
    (s, dir) =>
      Temporal.sessionized(s, dir)
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("session_events"))
        .groupBy(col("session_events"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("session_events"))

  /** Semi-structured extraction from the JSON `props` string (§2.9 C6).
    * regexp-based so the oracle needs no JSON extension. */
  private val jsonProps = GraftQuery(
    "e5_props_extraction",
    "JSON-ish field extraction from string props + agg (C6/E5)",
    Some(s"""
      SELECT event_type,
        COUNT(*) AS n_events,
        CAST(SUM(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        ${sqlDsum("value")} AS total_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      events(s, dir)
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          dsum(col("value")).as("total_value"))
        .orderBy("event_type"))

  /** Conversion funnel: users whose first view < first click < first
    * purchase (min-over-case conditional aggregation). */
  private val funnel = GraftQuery(
    "e5_conversion_funnel",
    "ordered funnel via conditional min timestamps (E5)",
    Some("""
      SELECT user_id FROM (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
      WHERE t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
        AND t_view < t_click AND t_click < t_purchase
      ORDER BY user_id"""),
    (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts"))).as("t_view"),
          min(when(col("event_type") === "click", col("ts"))).as("t_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
        .filter(col("t_view").isNotNull && col("t_click").isNotNull &&
          col("t_purchase").isNotNull &&
          col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
        .select(col("user_id"))
        .orderBy("user_id"))

  /** Native session_window generator (§2.10), batch-bound: the SAME
    * transform graft.streaming.EventStreams.sessionWindows runs
    * incrementally under readStream (withWatermark is a no-op in batch).
    * Oracle reproduces gap-merged sessions via lag + cumulative sum;
    * timestamps exported as epoch micros (ns-vs-µs precision never hits
    * the hash compare). */
  private val sessionWindowQ = GraftQuery(
    "e5_session_window",
    "native session_window gap sessionization, batch twin of the stream (§2.10/E5)",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      )
      SELECT user_id,
        epoch_us(min(ts)) AS session_start_us,
        epoch_us(max(ts)) + 1800000000 AS session_end_us,
        COUNT(*) AS session_events
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start_us"""),
    (s, dir) =>
      graft.streaming.EventStreams.sessionWindows(events(s, dir))
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("session_events"))
        .orderBy("user_id", "session_start_us"))

  /** Backward as-of join (custom operator — Spark has no built-in):
    * each purchase event picks up the same user's latest prior-or-equal
    * click via the single-shuffle union+window formulation in
    * [[graft.operators.AsOfJoin]]. Oracle reproduces it with
    * last_value IGNORE NULLS over the identically-ordered window. */
  private val asof = GraftQuery(
    "e5_asof_purchase_last_click",
    "backward as-of join purchase -> latest prior click per user (custom op)",
    Some("""
      WITH tagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'click' THEN ts END AS click_src,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side
        FROM events WHERE event_type IN ('click', 'purchase')),
      filled AS (
        SELECT user_id, event_id, ts, event_type,
          last_value(click_src IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, side, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        FROM tagged)
      SELECT user_id, event_id, epoch_us(ts) AS purchase_us,
             epoch_us(click_ts) AS last_click_us
      FROM filled WHERE event_type = 'purchase'
      ORDER BY user_id, event_id"""),
    (s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("click_ts", col("ts"))
        .select("user_id", "ts", "event_id", "click_ts")
      graft.operators.AsOfJoin
        .backward(purchases, clicks, "user_id", "ts", "event_id", Seq("click_ts"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("purchase_us"),
          unix_micros(col("click_ts")).as("last_click_us"))
        .orderBy("user_id", "event_id")
    })

  /** Nearest-direction as-of: each purchase matched to the closest click
    * either side ([[graft.operators.AsOfJoin.nearest]] — pandas
    * merge_asof direction='nearest'). Same single shuffle as the
    * backward op; the oracle ranks the full per-user candidate set by
    * the op's documented contract (distance, then backward-preferred,
    * then the side's tiebreak direction) — an O(pairs) spell-out the
    * engine never executes. */
  private val asofNearest = GraftQuery(
    "e5_asof_nearest_click",
    "nearest as-of join purchase -> closest click either direction (custom op)",
    Some("""
      WITH p AS (
        SELECT user_id AS u, event_id AS p_id, ts AS p_ts
        FROM events WHERE event_type = 'purchase'),
      c AS (
        SELECT user_id AS cu, event_id AS c_id, ts AS c_ts
        FROM events WHERE event_type = 'click'),
      cand AS (
        SELECT p.u, p.p_id, p.p_ts, c.c_id, c.c_ts,
               abs(epoch_us(c.c_ts) - epoch_us(p.p_ts)) AS adt,
               CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END AS dir
        FROM p LEFT JOIN c ON c.cu = p.u),
      ranked AS (
        SELECT *, row_number() OVER (
          PARTITION BY u, p_id, p_ts
          ORDER BY adt, dir, CASE WHEN dir = 0 THEN -c_id ELSE c_id END) AS rn
        FROM cand)
      -- the per-row-identity winner is re-attached onto every p row: the
      -- as-of emits one row PER LEFT ROW (pandas merge_asof semantics),
      -- so duplicate-KEY purchase copies (tenth axis, round 15) each
      -- carry the match; identical on a key-unique corpus. The rejoin is
      -- null-safe and keyed on (u, p_id, p_ts) — a NULL event_id
      -- purchase still surfaces with its own per-ts match instead of
      -- being dropped (plain = on p_id alone) or collapsed into one
      -- NULL-partition winner (r15 ADVICE)
      SELECT p.u AS user_id, p.p_id AS event_id,
             epoch_us(p.p_ts) AS purchase_us,
             epoch_us(r.c_ts) AS nearest_click_us,
             r.c_id AS nearest_click_id
      FROM p JOIN (SELECT * FROM ranked WHERE rn = 1) r
        ON p.u IS NOT DISTINCT FROM r.u
       AND p.p_id IS NOT DISTINCT FROM r.p_id
       AND p.p_ts IS NOT DISTINCT FROM r.p_ts
      ORDER BY user_id, event_id"""),
    (s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val clicks = ev.filter(col("event_type") === "click")
        .withColumn("click_id", col("event_id"))
        .select("user_id", "ts", "event_id", "click_id")
      graft.operators.AsOfJoin
        .nearest(purchases, clicks, "user_id", "ts", "event_id", Seq("click_id"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("purchase_us"),
          unix_micros(col("ts_matched")).as("nearest_click_us"),
          col("click_id").as("nearest_click_id"))
        .orderBy("user_id", "event_id")
    })

  /** C6 proper: from_json with an EXPLICIT schema (inference would scan
    * twice) and to_json re-serialization — the declarative JSON path the
    * reference's json.loads/passthrough maps to (call-debias.py:56,154).
    * Rows with no k field are filtered on both sides (Spark's to_json
    * drops null fields — '{}' vs SQL NULL would diverge). */
  private val jsonRoundtrip = GraftQuery(
    "e5_props_json_roundtrip",
    "from_json explicit schema + to_json canonicalization + agg (C6)",
    Some("""
      SELECT event_type,
        CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(DISTINCT '{"k":' || (props->>'k') || '}') AS n_payloads
      FROM events
      WHERE props->>'k' IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      events(s, dir)
        .withColumn("p", from_json(col("props"), "k BIGINT", Map.empty[String, String]))
        .filter(col("p.k").isNotNull)
        .withColumn("canon", to_json(struct(col("p.k").as("k"))))
        .groupBy(col("event_type"))
        .agg(sum(col("p.k")).as("sum_k"),
          countDistinct(col("canon")).as("n_payloads"))
        .orderBy("event_type"))

  /** Skew escape hatch, demonstrated: the same hourly aggregation as a
    * SALTED two-phase aggregate — phase 1 groups by (key, salt) spreading
    * any hot key over `salts` reducers, phase 2 merges the partials.
    * Result provably identical to the direct aggregation (same oracle as
    * e5_hourly_event_stats). Decimal partials make the two-phase sum
    * order-insensitive, so correctness survives the extra merge. */
  private val hourlySalted = GraftQuery(
    "e5_hourly_salted_agg",
    "salted two-phase aggregation, identical result to the direct agg (skew path)",
    Some(s"""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
        event_type,
        COUNT(*) AS n_events,
        ${sqlDsum("value")} AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) => {
      val salts = 8
      events(s, dir)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pc"), sum(money("value")).as("pv"))
        .groupBy(col("window"), col("event_type"))
        .agg(sum(col("pc")).as("n_events"), sum(col("pv")).cast("double").as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:00").as("hour_bucket"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy("hour_bucket", "event_type")
    })

  /** Analytic-function coverage beyond rank/sum: lag/lead with defaults,
    * first/last over a running frame, ntile, percent_rank — one window
    * spec, deterministic tiebreaks (§2.6). */
  private val windowAnalytics = GraftQuery(
    "e5_window_analytics",
    "lag/lead/first/last/ntile/percent_rank over per-user event order (§2.6)",
    Some(s"""
      SELECT user_id, event_id,
        lag(event_type, 1, 'none') OVER w AS prev_type,
        lead(event_type, 1, 'none') OVER w AS next_type,
        first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
        CAST(ntile(4) OVER w AS INT) AS quartile,
        ${graft.T.quantizeSql("percent_rank() OVER w", "1000000.0")} AS pr
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .select(col("user_id"), col("event_id"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          first(col("event_type")).over(wRun).as("first_type"),
          ntile(4).over(w).as("quartile"),
          graft.T.quantize(percent_rank().over(w), 1000000.0).as("pr"))
        .orderBy("user_id", "event_id")
    })

  /** Range/interval join: each event joined to the gap-session interval
    * that CONTAINS it. The join is equi on user_id with the range as a
    * residual predicate — per-user sort-merge, never a cross product;
    * the generic no-equi-key range join would need a bin/bucket
    * prefilter, which the session case avoids by construction.
    * Self-consistency makes it oracle-checkable: every event falls in
    * exactly one of its user's sessions, so per-session joined counts
    * equal the session sizes. */
  private val rangeJoin = GraftQuery(
    "e5_range_join_sessions",
    "interval containment join events -> enclosing session (equi+range)",
    Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      ), intervals AS (
        SELECT user_id, session_id,
          min(ts) AS session_start,
          max(ts) + INTERVAL 30 MINUTE AS session_end
        FROM sessions GROUP BY user_id, session_id)
      SELECT i.user_id,
             epoch_us(i.session_start) AS session_start_us,
             COUNT(*) AS n_events_in_range
      FROM intervals i
      JOIN events e
        ON e.user_id = i.user_id
       AND e.ts >= i.session_start AND e.ts < i.session_end
      GROUP BY i.user_id, i.session_start
      ORDER BY i.user_id, session_start_us"""),
    (s, dir) => {
      val ev = events(s, dir)
      val intervals = graft.streaming.EventStreams.sessionWindows(ev)
      intervals.as("i")
        .join(ev.as("e"),
          col("e.user_id") === col("i.user_id") &&
            col("e.ts") >= col("i.session_start") && col("e.ts") < col("i.session_end"))
        .groupBy(col("i.user_id").as("user_id"),
          unix_micros(col("i.session_start")).as("session_start_us"))
        .agg(count(lit(1)).as("n_events_in_range"))
        .orderBy("user_id", "session_start_us")
    })

  /** Sketch aggregates (the approximate pre-aggregation family): HLL++
    * distinct users and quantile-sketch percentiles per event type. No
    * SQL oracle (sketch internals are engine-specific); the spec bounds
    * each estimate against the exact answer at small SF, and
    * [[sketchExactTwin]] is the hash-checked exact companion over the
    * same grouping. */
  private val sketches = GraftQuery(
    "e5_sketch_aggregates",
    "approx_count_distinct (HLL++) + approx_percentile sketches (approx)",
    None,
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
          count(lit(1)).as("n_events"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("p95_value"))
        .orderBy("event_type"))

  /** The EXACT half of the sketch family, split out so it can be
    * oracle-paired: per event type, exact distinct users (what the HLL
    * approximates), exact counts, an order-insensitive decimal-exact
    * value sum, and exact min/max. Only the estimates themselves
    * (HLL/quantile sketches, engine-specific by construction) stay
    * rows-only in [[sketches]]; exact PERCENTILES are deliberately not
    * here either — both engines interpolate in doubles with different
    * formulas, so cross-engine hash equality is impossible
    * (q_approx_quantile_audit documents that and bounds them instead).
    *
    * Scale: same single partial/final aggregate as the sketch query;
    * the exact distinct adds the one key-expansion shuffle that HLL
    * exists to avoid — which is exactly the comparison this twin makes
    * auditable. */
  private val sketchExactTwin = GraftQuery(
    "e5_sketch_exact_twin",
    "exact distinct users / counts / decimal sums per event type — the sketch family's hash-checked companion",
    Some(s"""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(*) AS n_events,
             ${sqlDsum("value")} AS sum_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
    (s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy("event_type"))

  /** Cohort retention — the canonical product-analytics rollup: users
    * are cohorted by first-seen day, then each (cohort, day-offset)
    * cell counts distinct returning users and normalizes by cohort
    * size. Three shuffles, all on keys that scale with data: first-seen
    * agg on user_id, the cohort re-join on user_id (cohort map stays a
    * shuffle join — at 100 TB the user dimension is NOT broadcast-small),
    * and the cell agg on (cohort_day, day_offset) whose cardinality is
    * bounded by days², so the final agg is tiny regardless of corpus. */
  private val cohortRetention = GraftQuery(
    "e5_cohort_retention",
    "first-seen cohorts x day-offset distinct-user retention matrix",
    Some("""
      WITH c AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id),
      sz AS (SELECT cohort_day, count(*) AS cohort_size FROM c GROUP BY cohort_day),
      a AS (
        SELECT c.cohort_day,
               date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN c USING (user_id)
        GROUP BY c.cohort_day, date_diff('day', c.cohort_day, CAST(e.ts AS DATE)))
      SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day,
             CAST(a.day_offset AS BIGINT) AS day_offset,
             a.n_active,
             CAST(sz.cohort_size AS BIGINT) AS cohort_size,
             a.n_active / CAST(sz.cohort_size AS DOUBLE) AS retention_rate
      FROM a JOIN sz USING (cohort_day)
      ORDER BY cohort_day, day_offset"""),
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val sizes = cohorts.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
      ev.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .join(sizes, Seq("cohort_day"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("day_offset"), col("n_active"), col("cohort_size"),
          (col("n_active") / col("cohort_size")).as("retention_rate"))
        .orderBy("cohort_day", "day_offset")
    })

  /** RFM (recency/frequency/monetary) segmentation — the classic user
    * scoring rollup, built the way it must be at 100 TB: quartile
    * thresholds come from ONE exact-percentile aggregate broadcast back
    * over the user frame, NOT from a global ntile window (ntile
    * partitions nothing, so it funnels the whole user dimension through
    * one sort task — the canonical scale-killer this query refuses).
    *
    * Determinism across engines: all three metrics are INTEGERS
    * (days / counts / cents — cents because per-user dollar sums of
    * 2-decimal values land exactly on .5 rounding boundaries, where
    * engine-order FP noise flips round()), so quartile interpolation
    * (a + f*(b-a) over ints) is exact in IEEE double and the strict >
    * threshold comparisons agree bit-for-bit. */
  private val rfm = GraftQuery(
    "e5_rfm_segments",
    "RFM quartile segmentation via broadcast exact-percentile thresholds",
    Some(s"""
      WITH mx AS (SELECT max(CAST(ts AS DATE)) AS dmax FROM events),
      u AS (
        SELECT user_id,
               date_diff('day', max(CAST(ts AS DATE)), (SELECT dmax FROM mx)) AS recency_days,
               count(*) AS frequency,
               CAST(round(sum(CASE WHEN ${T.sqlMoneyRange("value")} THEN value END) * 100, 0)
                    AS BIGINT) AS monetary_cents
        FROM events GROUP BY user_id),
      q AS (
        SELECT quantile_cont(recency_days, 0.25) AS r1, quantile_cont(recency_days, 0.5) AS r2,
               quantile_cont(recency_days, 0.75) AS r3,
               quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
               quantile_cont(frequency, 0.75) AS f3,
               quantile_cont(monetary_cents, 0.25) AS m1, quantile_cont(monetary_cents, 0.5) AS m2,
               quantile_cont(monetary_cents, 0.75) AS m3
        FROM u),
      s AS (
        SELECT u.user_id, u.recency_days, u.frequency, u.monetary_cents,
               4 - ((u.recency_days > q.r1)::INT + (u.recency_days > q.r2)::INT
                    + (u.recency_days > q.r3)::INT) AS r_score,
               1 + (u.frequency > q.f1)::INT + (u.frequency > q.f2)::INT
                 + (u.frequency > q.f3)::INT AS f_score,
               1 + (u.monetary_cents > q.m1)::INT + (u.monetary_cents > q.m2)::INT
                 + (u.monetary_cents > q.m3)::INT AS m_score
        FROM u CROSS JOIN q)
      SELECT user_id, recency_days, frequency, monetary_cents,
             CAST(r_score AS BIGINT) AS r_score,
             CAST(f_score AS BIGINT) AS f_score,
             CAST(m_score AS BIGINT) AS m_score,
             CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment
      FROM s
      ORDER BY user_id"""),
    (s, dir) => {
      val ev = events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      // aggregate FIRST, then attach the 1-row corpus max to the (small)
      // user frame — never to the corpus-sized event stream. The user
      // frame feeds two plan branches (the percentile-threshold agg AND
      // the scoring probe side), so it is memoized/persisted and events
      // is scanned exactly once per run: the corpus max derives from the
      // cached per-user maxes, not a second pass over events. Released
      // by SessionMemo.clear.
      val u = graft.SessionMemo.memoized(s, dir, "rfm_user_frame") {
        val base = ev.groupBy(col("user_id"))
          .agg(max(col("day")).as("last_day"),
            count(lit(1)).as("frequency"),
            // only money-representable values (T.moneyRange: finite,
            // |v| < 1e16) carry a monetary reading; without the guard a
            // NaN sum overflowed the ANSI BIGINT cast, and a finite
            // 1e20 would too (measured, round-11 degenerate gates)
            round(sum(when(T.moneyRange(col("value")), col("value"))) * 100, 0)
              .cast("long").as("monetary_cents"))
          .persist()
        try {
          val mx = base.agg(max(col("last_day")).as("dmax"))
          val built = base.crossJoin(broadcast(mx))
            .select(col("user_id"),
              datediff(col("dmax"), col("last_day")).cast("long").as("recency_days"),
              col("frequency"), col("monetary_cents"))
            .persist()
          try built.count()
          catch { case t: Throwable => built.unpersist(); throw t }
          built
        } finally base.unpersist() // scratch either way; built stands alone once counted
      }
      val q = u.agg(
        expr("percentile(recency_days, 0.25D)").as("r1"),
        expr("percentile(recency_days, 0.5D)").as("r2"),
        expr("percentile(recency_days, 0.75D)").as("r3"),
        expr("percentile(frequency, 0.25D)").as("f1"),
        expr("percentile(frequency, 0.5D)").as("f2"),
        expr("percentile(frequency, 0.75D)").as("f3"),
        expr("percentile(monetary_cents, 0.25D)").as("m1"),
        expr("percentile(monetary_cents, 0.5D)").as("m2"),
        expr("percentile(monetary_cents, 0.75D)").as("m3"))
      def gt(v: Column, t: Column) = when(v > t, 1L).otherwise(0L)
      u.crossJoin(broadcast(q))
        .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"),
          (lit(4L) - gt(col("recency_days"), col("r1")) - gt(col("recency_days"), col("r2"))
            - gt(col("recency_days"), col("r3"))).as("r_score"),
          (lit(1L) + gt(col("frequency"), col("f1")) + gt(col("frequency"), col("f2"))
            + gt(col("frequency"), col("f3"))).as("f_score"),
          (lit(1L) + gt(col("monetary_cents"), col("m1")) + gt(col("monetary_cents"), col("m2"))
            + gt(col("monetary_cents"), col("m3"))).as("m_score"))
        .withColumn("segment",
          concat(col("r_score").cast("string"), col("f_score").cast("string"),
            col("m_score").cast("string")))
        .orderBy("user_id")
    })

  /** Per-rule violation counts over any frame carrying the event
    * columns — the aggregation core of [[qualityGateAudit]], factored
    * so QualityGatePropSpec can assert a MemoryStream run of
    * [[graft.streaming.EventStreams.startQualityGate]] aggregates to
    * exactly this. One scan: global conditional sums, then the 4-row
    * stack via an explode over per-rule structs. */
  private[graft] def qualityAudit(df: DataFrame): DataFrame = {
    val rules = graft.streaming.EventStreams.eventRules
    val tagged = graft.streaming.EventStreams.withViolations(df)
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case ((name, _, _), i) =>
        sum(when(array_contains(col("violations"), name), 1L).otherwise(0L))
          .as(s"v$i")
      }
    val stacked = rules.zipWithIndex.map { case ((name, _, _), i) =>
      struct(lit(name).as("rule"), col(s"v$i").as("n_violations"))
    }
    tagged.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(stacked: _*)).as("e"))
      .select(col("e.rule").as("rule"), col("e.n_violations").as("n_violations"),
        col("n_rows"),
        (col("e.n_violations").cast("double") / col("n_rows")).as("violation_share"))
      .orderBy("rule")
  }

  /** Batch twin of the streaming quality gate (§2.10): classify every
    * event against [[graft.streaming.EventStreams.eventRules]] and
    * aggregate violations by rule — always one row per rule (zero
    * counts included), so the audit is never vacuously empty. The
    * oracle SQL is GENERATED from the same rule list's ANSI twins, so
    * rule names/semantics cannot drift between the gate, this audit,
    * and the oracle. violation_share is a single division of two exact
    * counts — cross-engine exact. */
  private val qualityGateAudit = GraftQuery(
    "e5_quality_gate_audit",
    "quality-gate rule audit: per-rule violation counts + share over events (E5/§2.10 batch twin of startQualityGate)",
    Some {
      val rules = graft.streaming.EventStreams.eventRules
      val sums = rules.zipWithIndex.map { case ((_, _, sqlPred), i) =>
        s"CAST(SUM(CASE WHEN NOT coalesce($sqlPred, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v$i"
      }.mkString(",\n               ")
      val stack = rules.zipWithIndex.map { case ((name, _, _), i) =>
        s"SELECT '$name' AS rule, v$i AS n_violations, n_rows FROM agg"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH agg AS (
        SELECT count(*) AS n_rows,
               $sums
        FROM events)
      SELECT rule, n_violations, n_rows,
             CAST(n_violations AS DOUBLE) / n_rows AS violation_share
      FROM (
        $stack)
      ORDER BY rule"""
    },
    (s, dir) => qualityAudit(events(s, dir)))

  def queries: Seq[GraftQuery] =
    Seq(hourly, sessionize, sessionHistogram, jsonProps, funnel, sessionWindowQ, asof,
      asofNearest,
      jsonRoundtrip, hourlySalted, windowAnalytics, rangeJoin, sketches,
      sketchExactTwin, cohortRetention,
      rfm, qualityGateAudit)
}
