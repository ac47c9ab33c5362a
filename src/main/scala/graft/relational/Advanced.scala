package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational wave (extension family E6): grouping sets,
  * ordered-set/selector aggregates, list aggregation, array functions,
  * unpivot, exact percentiles, and time-range window frames — the
  * remaining ANSI surface a user of a full analytics engine expects.
  *
  * Scale posture matches Relational.scala: no forced broadcasts of
  * SF-scaled tables, partial+final hash aggregates throughout, windows
  * partitioned by high-cardinality keys (bounded per-group state).
  * Determinism discipline: decimal-exact money sums, unique tie-breaks
  * on every ORDER BY, dyadic percentile fractions (exact in FP on both
  * engines), and a uniqueness-by-construction sort key for max_by.
  */
object Advanced {

  import T._

  /** GROUPING SETS with grouping_id — finer than rollup/cube (already
    * covered): the explicit per-dimension marginals + grand total, the
    * shape a dashboard's "totals by each dimension" query compiles to.
    * One Expand + single hash aggregate in Spark (no re-scan per set). */
  private val groupingSets = GraftQuery(
    "q_grouping_sets",
    "GROUPING SETS (flag),(status),() with grouping_id (E6 §2.4)",
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
             COUNT(*) AS n_items,
             ${sqlDsum("l_quantity")} AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    (s, dir) => {
      val src = T(s, dir, "lineitem")
      val main = src
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_items"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n_items"), col("sum_qty"))
      // empty-input standard `()` row (gid = GROUPING(flag,status) = 3)
      // — see q_rollup_order_stats' scaladoc (r18)
      val out =
        if (T.tableIsEmpty(s, dir, "lineitem"))
          main.unionByName(src
            .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
            .select(lit(null).cast("string").as("l_returnflag"),
              lit(null).cast("string").as("l_linestatus"),
              lit(3L).as("gid"), col("n_items"), col("sum_qty")))
        else main
      out.orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
    })

  /** max_by/min_by selector aggregates (DuckDB arg_max/arg_min). The
    * ordering value is made unique BY CONSTRUCTION — a zero-padded
    * fixed-width "cents|orderkey" string — because max_by over a tied
    * value is free to pick either row in both engines. totalprice has
    * 2 decimals, so *100 is integral up to FP noise «1e-6 and the
    * round() can never sit on a .5 boundary (where Spark HALF_UP and
    * DuckDB half-even diverge). */
  private val maxBy = GraftQuery(
    "q_max_by_selectors",
    "max_by/min_by per customer with a unique composite sort key (E6 §2.4)",
    Some(s"""
      SELECT o_custkey,
        arg_max(o_orderkey, lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 12, '0')
                            || '|' || lpad(CAST(o_orderkey AS VARCHAR), 19, '0')) AS best_order,
        arg_min(o_orderkey, lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 12, '0')
                            || '|' || lpad(CAST(o_orderkey AS VARCHAR), 19, '0')) AS worst_order,
        CAST(MAX(${sqlMoney("o_totalprice")}) AS DOUBLE) AS best_price,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY o_custkey
      ORDER BY o_custkey"""),
    (s, dir) => {
      // zero-padded fixed-width STRING key: lexicographic order equals
      // numeric (cents, orderkey) order for non-negative ints, and the
      // key stays unique at ANY scale — the previous cents*1e10+okey
      // BIGINT composite silently re-admitted ties once o_orderkey
      // reached 1e10 (~SF 1.7k), the exact nondeterminism it existed
      // to prevent. 12 digits cover cents (o_totalprice is per-order
      // bounded, SF-independent); 19 cover any positive BIGINT key.
      val key = concat(
        lpad(round(col("o_totalprice") * 100).cast("long").cast("string"), 12, "0"),
        lit("|"),
        lpad(col("o_orderkey").cast("string"), 19, "0"))
      T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max_by(col("o_orderkey"), key).as("best_order"),
          min_by(col("o_orderkey"), key).as("worst_order"),
          max(money("o_totalprice")).cast("double").as("best_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    })

  /** Ordered string aggregation (LISTAGG/string_agg). collect_list is
    * order-nondeterministic under parallelism, so the deterministic
    * formulation is collect_list → array_sort → array_join — sort AFTER
    * collecting, never rely on input order surviving a shuffle. */
  private val listAgg = GraftQuery(
    "q_listagg_nations",
    "ordered string_agg of nations per region (E6 §2.4)",
    Some("""
      SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             COUNT(*) AS n_nations
      FROM region JOIN nation ON r_regionkey = n_regionkey
      GROUP BY r_name
      ORDER BY r_name"""),
    (s, dir) =>
      T(s, dir, "region")
        .join(T(s, dir, "nation"),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy("r_name"))

  /** Array-function surface over split tokens: distinct/sort/slice/
    * join/contains — all codegen'd builtins (no UDF). DuckDB's list
    * slice [1:3] and Spark's slice(arr,1,3) both clamp past the end. */
  private val arrayFuncs = GraftQuery(
    "q_array_functions",
    "array_distinct/sort/slice/join/contains over tokenized names (§2.9)",
    Some("""
      SELECT p_partkey,
        array_to_string(list_sort(list_distinct(string_split(p_name, ' ')))[1:3], '-') AS top_toks,
        CAST(len(list_distinct(string_split(p_name, ' '))) AS INT) AS n_distinct_toks,
        list_contains(string_split(p_name, ' '), 'red') AS has_red
      FROM part
      ORDER BY p_partkey"""),
    (s, dir) =>
      T(s, dir, "part")
        .withColumn("toks", split(col("p_name"), " ", -1))
        .select(col("p_partkey"),
          array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), "-")
            .as("top_toks"),
          size(array_distinct(col("toks"))).as("n_distinct_toks"),
          array_contains(col("toks"), "red").as("has_red"))
        .orderBy("p_partkey"))

  /** Unpivot (wide measures → long key/value rows) — Spark's melt.
    * Oracle spelled as UNION ALL (the engine-neutral expansion). All
    * unpivoted measures must share one type: counts cast to double. */
  private val unpivotQ = GraftQuery(
    "q_unpivot_measures",
    "unpivot per-flag measures to (measure, value) rows (E6 §2.8)",
    Some(s"""
      WITH agg AS (
        SELECT l_returnflag,
          ${sqlDsum("l_quantity")} AS sum_qty,
          ${sqlDsum("l_extendedprice")} AS sum_price,
          CAST(COUNT(*) AS DOUBLE) AS n_items
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM agg
      UNION ALL
      SELECT l_returnflag, 'n_items', n_items FROM agg
      ORDER BY l_returnflag, measure"""),
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_items"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("n_items")),
          "measure", "value")
        .orderBy("l_returnflag", "measure"))

  /** Exact percentiles (ordered-set aggregate): Spark percentile ==
    * DuckDB quantile_cont (both interpolate at (n-1)·q). Quantities are
    * integral and the fractions dyadic, so the interpolation arithmetic
    * is EXACT in IEEE double on both engines — no rounding slack needed.
    * (Non-dyadic fractions or non-integral data would need round().)
    * Quartiles are emitted as three scalar columns, not one array: the
    * verify harness can only hash-compare scalar cells. */
  private val percentiles = GraftQuery(
    "q_exact_percentiles",
    "exact percentile/median ordered-set aggregates per flag (E6 §2.4)",
    Some("""
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.25) AS qty_q25,
             quantile_cont(l_quantity, 0.5)  AS qty_q50,
             quantile_cont(l_quantity, 0.75) AS qty_q75,
             median(l_quantity) AS qty_median,
             COUNT(*) AS n_items
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""),
    (s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25D)").as("qty_q25"),
          expr("percentile(l_quantity, 0.5D)").as("qty_q50"),
          expr("percentile(l_quantity, 0.75D)").as("qty_q75"),
          expr("median(l_quantity)").as("qty_median"),
          count(lit(1)).as("n_items"))
        .orderBy("l_returnflag"))

  /** Time-RANGE window frame: per-customer rolling 90-day spend. RANGE
    * frames include ALL peers of the current order key (same-day orders),
    * so the result is deterministic without a tie-break; the decimal sum
    * keeps it order-insensitive. Epoch seconds as the range key — Spark's
    * rangeBetween needs a numeric ordering column, and DuckDB's epoch()
    * returns DOUBLE so both sides cast explicitly to BIGINT. */
  private val rangeFrame = GraftQuery(
    "q_window_range_frame",
    "rolling 90-day spend per customer via RANGE frame (E6 §2.6)",
    Some(s"""
      SELECT o_custkey, o_orderkey,
        ${sqlDec2Dbl(s"""SUM(${sqlMoney("o_totalprice")}) OVER (
          PARTITION BY o_custkey
          ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
          RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)""")} AS spend_90d
      FROM orders
      ORDER BY o_custkey, o_orderkey"""),
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_s"))
        .rangeBetween(-90L * 86400L, Window.currentRow)
      T(s, dir, "orders")
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .withColumn("spend_90d", sum(money("o_totalprice")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("spend_90d"))
        .orderBy("o_custkey", "o_orderkey")
    })

  /** MERGE/upsert semantics via FULL OUTER join + coalesce: maintain a
    * per-customer aggregate incrementally — `base` is the materialized
    * state (orders before the cutoff), `delta` the new batch — and
    * classify every output row insert/update/unchanged, exactly what a
    * lakehouse MERGE INTO compiles to. The point at scale: the delta
    * batch is re-aggregated and merged WITHOUT rescanning base facts.
    *
    * Plan shape: both sides aggregate on o_custkey, so the full outer
    * join joins two frames already hash-partitioned on the join key —
    * no third shuffle (Spark reuses the aggregation exchanges). Money
    * sums use the decimal-exact discipline (T.dsum) so the merged
    * totals hash-match the oracle; the merge addition itself is one
    * double op, deterministic. */
  private val mergeUpsert = GraftQuery(
    "q_merge_upsert",
    "MERGE/upsert via full outer join + coalesce, insert/update classification (E6 §2.3)",
    Some(s"""
      WITH base AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS spend
        FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_custkey),
      delta AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS spend
        FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_custkey)
      SELECT COALESCE(b.o_custkey, d.o_custkey) AS o_custkey,
             COALESCE(b.n_orders, 0) + COALESCE(d.n_orders, 0) AS n_orders,
             COALESCE(b.spend, CAST(0 AS DOUBLE)) + COALESCE(d.spend, CAST(0 AS DOUBLE)) AS spend,
             CASE WHEN b.o_custkey IS NULL THEN 'insert'
                  WHEN d.o_custkey IS NULL THEN 'unchanged'
                  ELSE 'update' END AS merge_op
      FROM base b FULL OUTER JOIN delta d ON b.o_custkey = d.o_custkey
      ORDER BY o_custkey"""),
    (s, dir) => {
      val cutoff = expr("timestamp'1998-01-01 00:00:00'")
      def agg(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      val orders = T(s, dir, "orders")
      val base = agg(orders.filter(col("o_orderdate") < cutoff)).as("b")
      val delta = agg(orders.filter(col("o_orderdate") >= cutoff)).as("d")
      base
        .join(delta, col("b.o_custkey") === col("d.o_custkey"), "full_outer")
        .select(
          coalesce(col("b.o_custkey"), col("d.o_custkey")).as("o_custkey"),
          (coalesce(col("b.n_orders"), lit(0L)) + coalesce(col("d.n_orders"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("b.spend"), lit(0.0)) + coalesce(col("d.spend"), lit(0.0)))
            .as("spend"),
          when(col("b.o_custkey").isNull, "insert")
            .when(col("d.o_custkey").isNull, "unchanged")
            .otherwise("update").as("merge_op"))
        .orderBy(col("o_custkey"))
    })

  /** The full ranking-function family (§2.6 breadth) in one audit:
    * rank / dense_rank / percent_rank / cume_dist over an ordering WITH
    * ties (order-month within priority — tie groups are where the four
    * functions differ), plus ntile(4) and a 2nd-order lead over a
    * TIE-FREE ordering (month, orderkey). The split matters for
    * determinism: rank-family values are identical for all ties, but
    * ntile/nth assignment within a tie group depends on physical row
    * order — giving them a total order keeps the result engine- and
    * partitioning-independent. Plan: both specs share the same
    * partition key, so one Exchange + one in-partition sort serves the
    * whole projection. */
  private val rankFamily = GraftQuery(
    "q_window_rank_family",
    "rank/dense_rank/percent_rank/cume_dist over ties + ntile/nth over total order (§2.6)",
    Some("""
      SELECT o_orderkey, o_orderpriority,
             strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
             rank() OVER w_ties AS rnk,
             dense_rank() OVER w_ties AS drnk,
             percent_rank() OVER w_ties AS prnk,
             cume_dist() OVER w_ties AS cdist,
             ntile(4) OVER w_total AS quartile,
             lead(o_orderkey, 2) OVER w_total AS second_next_key
      FROM orders
      WINDOW
        w_ties AS (PARTITION BY o_orderpriority
                   ORDER BY date_trunc('month', o_orderdate)),
        w_total AS (PARTITION BY o_orderpriority
                    ORDER BY date_trunc('month', o_orderdate), o_orderkey)
      ORDER BY o_orderpriority, order_month, o_orderkey"""),
    (s, dir) => {
      val month = date_trunc("month", col("o_orderdate"))
      val wTies = Window.partitionBy(col("o_orderpriority")).orderBy(month)
      val wTotal = Window.partitionBy(col("o_orderpriority"))
        .orderBy(month, col("o_orderkey"))
      T(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderpriority"),
          date_format(month, "yyyy-MM").as("order_month"),
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"),
          percent_rank().over(wTies).as("prnk"),
          cume_dist().over(wTies).as("cdist"),
          ntile(4).over(wTotal).cast("long").as("quartile"),
          lead(col("o_orderkey"), 2).over(wTotal).as("second_next_key"))
        .orderBy(col("o_orderpriority"), col("order_month"), col("o_orderkey"))
    })

  /** Row-level CDC snapshot diff (the companion to q_merge_upsert's
    * aggregate MERGE): two per-customer activity snapshots — 1997 H1 vs
    * 1997 H2 — full-outer-joined on the key and every row classified
    * added / removed / changed / unchanged with old+new values carried.
    * This is the change-audit every incremental pipeline publishes when
    * a new snapshot lands.
    *
    * Plan shape: both snapshots aggregate the same fact scan on
    * o_custkey, so the full outer join consumes two frames already
    * partitioned on the join key (no third shuffle); the classification
    * is a pure projection. Spend equality is exact (decimal-summed
    * doubles), so 'changed' vs 'unchanged' is never a float judgement
    * call. */
  private val snapshotDiff = GraftQuery(
    "q_snapshot_diff",
    "CDC diff of two per-customer snapshots: added/removed/changed/unchanged (E6 §2.3)",
    Some(s"""
      WITH a AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS spend
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY o_custkey),
      b AS (
        SELECT o_custkey, COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS spend
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY o_custkey)
      SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
             a.n_orders AS old_n_orders, b.n_orders AS new_n_orders,
             a.spend AS old_spend, b.spend AS new_spend,
             CASE WHEN a.o_custkey IS NULL THEN 'added'
                  WHEN b.o_custkey IS NULL THEN 'removed'
                  WHEN a.n_orders = b.n_orders AND a.spend = b.spend THEN 'unchanged'
                  ELSE 'changed' END AS change_type
      FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
      ORDER BY o_custkey"""),
    (s, dir) => {
      val orders = T(s, dir, "orders")
      def snap(lo: String, hi: String) = orders
        .filter(col("o_orderdate") >= expr(s"timestamp'$lo'") &&
          col("o_orderdate") < expr(s"timestamp'$hi'"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      val a = snap("1997-01-01 00:00:00", "1997-07-01 00:00:00").as("a")
      val b = snap("1997-07-01 00:00:00", "1998-01-01 00:00:00").as("b")
      a.join(b, col("a.o_custkey") === col("b.o_custkey"), "full_outer")
        .select(
          coalesce(col("a.o_custkey"), col("b.o_custkey")).as("o_custkey"),
          col("a.n_orders").as("old_n_orders"), col("b.n_orders").as("new_n_orders"),
          col("a.spend").as("old_spend"), col("b.spend").as("new_spend"),
          when(col("a.o_custkey").isNull, "added")
            .when(col("b.o_custkey").isNull, "removed")
            .when(col("a.n_orders") === col("b.n_orders") &&
              col("a.spend") === col("b.spend"), "unchanged")
            .otherwise("changed").as("change_type"))
        .orderBy(col("o_custkey"))
    })

  def queries: Seq[GraftQuery] =
    Seq(groupingSets, maxBy, listAgg, arrayFuncs, unpivotQ, percentiles, rangeFrame,
      mergeUpsert, rankFamily, snapshotDiff)
}
