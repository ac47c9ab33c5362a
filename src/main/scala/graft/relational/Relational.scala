package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational coverage (SURVEY.md §2.3 joins, §2.4 aggregations, §2.6
  * windows, §2.7 sorts/limits, §2.8 set ops, §2.9 scalar functions —
  * extension family E6) over the TPC-H-ish testdata.
  *
  * Scale posture: explicit `broadcast()` hints ONLY on the
  * fixed-cardinality dims (nation=25 rows, region=5 rows — constants of
  * the schema, broadcastable at any SF). customer/supplier/part scale
  * linearly with SF, so their join strategy is left to AQE/statistics:
  * broadcast at bench scale, shuffle-hash/sort-merge at 100 TB — a forced
  * broadcast there would OOM every executor. Fact-fact joins
  * (orders⋈lineitem) shuffle on the join key — the natural co-partition
  * key for bucketing in a real deployment. Aggregations are all
  * partial+final hash aggregates (map-side combine) by construction.
  */
object Relational {

  import T._

  /** TPC-H Q1 shape: pricing summary. Exercises filter pushdown to
    * parquet + partial/final hash agg. Reference analog: A1 group-count
    * family (dashboard_widget.py:101-113) generalized to multi-measure. */
  private val q1 = GraftQuery(
    "q1_pricing_summary",
    "Scan+filter+groupBy multi-aggregate (A1/E6); predicate pushdown",
    Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        ${sqlDec2Dbl(s"SUM(${sqlDiscPrice("l_extendedprice", "l_discount")})")} AS sum_disc_price,
        ${sqlDec2Dbl(s"SUM(${sqlCharge("l_extendedprice", "l_discount", "l_tax")})")} AS sum_charge,
        ${sqlDsum("l_quantity")} / COUNT(*) AS avg_qty,
        ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) => {
      val li = T(s, dir, "lineitem")
        .filter(col("l_shipdate") <= expr("timestamp'2001-09-01 00:00:00'"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax")))
            .cast("double").as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    })

  /** TPC-H Q3 shape: 3-way join + agg + top-k; orders⋈lineitem shuffles
    * on orderkey, customer join strategy left to AQE (SF-scaled table). */
  private val q3 = GraftQuery(
    "q3_top_unshipped_orders",
    "3-way join + group + global top-k with tiebreak (E6/O1)",
    Some(s"""
      SELECT o_orderkey,
        ${sqlDec2Dbl(s"SUM(${sqlDiscPrice("l_extendedprice", "l_discount")})")} AS revenue,
        CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""),
    (s, dir) => {
      val cust = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
      val li = T(s, dir, "lineitem")
        .filter(col("l_shipdate") > expr("timestamp'1998-01-01 00:00:00'"))
      // customer scales with SF — no forced broadcast; AQE/statistics pick
      // the join strategy (broadcast at small SF, shuffle join at 100 TB)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    })

  /** TPC-H Q5 shape: 6-way star join through region→nation→customer and
    * supplier co-location condition. Fixed-cardinality nation/region
    * broadcast; SF-scaled customer/supplier left to AQE. */
  private val q5 = GraftQuery(
    "q5_region_revenue",
    "6-way star join + agg + sort (E6); dims broadcast",
    Some(s"""
      SELECT n_name,
        ${sqlDec2Dbl(s"SUM(${sqlDiscPrice("l_extendedprice", "l_discount")})")} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
    (s, dir) => {
      val ord = T(s, dir, "orders")
        .filter(col("o_orderdate") >= expr("timestamp'1996-01-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1998-01-01 00:00:00'"))
      val li = T(s, dir, "lineitem")
      val region = T(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = T(s, dir, "nation")
      // customer/supplier scale with SF — leave their join strategy to
      // AQE; only the fixed-cardinality dims (nation=25, region=5) get
      // explicit broadcast hints
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(T(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    })

  /** Semi join: suppliers that shipped anything recently (EXISTS). */
  private val qSemi = GraftQuery(
    "q_semi_join",
    "left_semi join = EXISTS (§2.3)",
    Some("""
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
                    AND l_shipdate >= TIMESTAMP '2001-01-01 00:00:00')
      ORDER BY s_suppkey"""),
    (s, dir) => {
      val recent = T(s, dir, "lineitem")
        .filter(col("l_shipdate") >= expr("timestamp'2001-01-01 00:00:00'"))
      T(s, dir, "supplier")
        .join(recent, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    })

  /** Anti join: customers that never ordered (NOT EXISTS). */
  private val qAnti = GraftQuery(
    "q_anti_join",
    "left_anti join with compound condition = NOT EXISTS (§2.3)",
    // the recency predicate keeps the oracle compare non-vacuous at
    // EVERY test SF (1/8/99 rows at sf0.001/0.01/0.1 — an empty-vs-empty
    // compare proves nothing) and exercises an anti join whose condition
    // is equi + non-equi, not just the key match
    Some("""
      SELECT c_custkey, c_name
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '1998-04-01 00:00:00')
      ORDER BY c_custkey"""),
    (s, dir) =>
      T(s, dir, "customer")
        .join(T(s, dir, "orders"),
          col("c_custkey") === col("o_custkey") &&
            col("o_orderdate") >= expr("timestamp'1998-04-01 00:00:00'"),
          "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"))

  /** Top-3 orders per customer: ranking window (§2.6). */
  private val qWindowTopk = GraftQuery(
    "q_window_topk_per_group",
    "row_number() ranking window, top-k per group (§2.6)",
    Some("""
      SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT c_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM customer JOIN orders ON c_custkey = o_custkey)
      WHERE rn <= 3
      ORDER BY c_custkey, rn"""),
    (s, dir) => {
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      // customer scales with SF — AQE picks the strategy
      T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w).cast("long")) // DuckDB row_number() is BIGINT
        .filter(col("rn") <= 3)
        .orderBy(col("c_custkey"), col("rn"))
    })

  /** Running (cumulative) spend per customer: analytic frame window. */
  private val qWindowRunning = GraftQuery(
    "q_window_running_sum",
    "cumulative sum over rowsBetween frame (§2.6)",
    Some(s"""
      -- o_totalprice completes the total order: a corrupt-key order copy
      -- (same key/date, different price) ties on (date, key), and a
      -- running sum over a tied order with UNEQUAL summed values is
      -- engine-dependent (the mm_shard_manifest class, round 15; audited
      -- here round 16). Remaining ties sum equal values — cum well-defined.
      SELECT o_custkey, o_orderkey,
        CAST(CAST((SUM(${sqlMoney("o_totalprice")})
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey, o_totalprice
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS VARCHAR) AS DOUBLE)
          AS running_spend
      FROM orders
      WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey"""),
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(money("o_totalprice")).over(w).cast("double").as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    })

  /** ROLLUP hierarchy aggregation (beyond reference — §2.4 note).
    *
    * Empty-input boundary (r18, found by the first FULL-oracle run of
    * the empty axis): the SQL standard's `()` grouping set aggregates
    * an empty input to ONE row (count 0, NULL sums) — DuckDB and
    * Postgres emit it, but Spark's Expand-based rollup/cube/grouping
    * sets emit NOTHING (Expand produces output per input row, and
    * there are none). A one-row `isEmpty` probe at construction guards
    * a union branch carrying the standard row, so the non-empty plan —
    * the only one that exists at scale — stays single-scan. The probe
    * is an EAGER extra job, and deliberately so: every lazy alternative
    * considered (a count-0-filtered grand aggregate unioned in, or a
    * literal row anti-joined against `limit(1)`) re-aggregates or
    * re-scans the source INSIDE the plan — a second full pass at 100 TB
    * — whereas `isEmpty` is `limit(1)` over the scan: it reads one row
    * and stops. Cheapest of the options at scale; same for the cube and
    * grouping-sets twins below and in Advanced. The probe is memoized
    * per (session, dir, table) ([[graft.T.tableIsEmpty]]) so repeat
    * constructions — three grouping queries × three bench passes —
    * share ONE job instead of paying nine. */
  private val qRollup = GraftQuery(
    "q_rollup_order_stats",
    "GROUP BY ROLLUP with subtotals + grand total (§2.4)",
    Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_spend
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""),
    (s, dir) => {
      val src = T(s, dir, "orders")
      val main = src
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      val out =
        if (T.tableIsEmpty(s, dir, "orders"))
          main.unionByName(src
            .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
            .select(lit(null).cast("string").as("o_orderstatus"),
              lit(null).cast("string").as("o_orderpriority"),
              col("n_orders"), col("total_spend")))
        else main
      out.orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)
    })

  /** COUNT(DISTINCT) + plain count in one aggregate (§2.4). */
  private val qDistinctAgg = GraftQuery(
    "q_distinct_agg",
    "count(distinct) alongside plain aggregates (§2.4/A4)",
    Some(s"""
      SELECT o_orderpriority,
        COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders,
        ${sqlDsum("o_totalprice")} AS total_spend
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spend"))
        .orderBy("o_orderpriority"))

  /** Set operations: INTERSECT / EXCEPT / UNION over key sets (§2.8). */
  private val qSetOps = GraftQuery(
    "q_set_ops",
    "intersect + except + union distinct (§2.8)",
    Some("""
      SELECT c_custkey FROM (
        ((SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
          INTERSECT
          SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
         UNION
         SELECT o_custkey FROM orders
         WHERE o_orderpriority = '2-HIGH' AND o_totalprice > 350000)
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_totalprice > 400000
      )
      ORDER BY c_custkey"""),
    (s, dir) => {
      val ord = T(s, dir, "orders")
      val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      val low = ord.filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey").as("c_custkey"))
      val highBig = ord.filter(col("o_orderpriority") === "2-HIGH" &&
          col("o_totalprice") > 350000)
        .select(col("o_custkey").as("c_custkey"))
      val big = ord.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      // union().distinct() == SQL UNION (distinct); except is EXCEPT
      // DISTINCT in both engines
      urgent.intersect(low).union(highBig).distinct()
        .except(big).orderBy("c_custkey")
    })

  /** Scalar string functions over part (§2.9 C1-C5 analogs). */
  private val qScalarFuncs = GraftQuery(
    "q_scalar_string_funcs",
    "trim/upper/substring/concat/length/split_part (§2.9)",
    Some(s"""
      SELECT p_partkey,
        ${T.sqlAsciiUpper("p_name")} AS name_upper,
        length(p_name) AS name_len,
        split_part(p_name, ' ', 1) AS first_word,
        CASE WHEN strpos(p_name, ' ') > 0
             THEN ${T.sqlUstrip("substring(p_name, strpos(p_name, ' ') + 1)")}
             ELSE '' END AS rest_words,
        p_brand || '/' || p_type AS brand_type
      FROM part
      ORDER BY p_partkey"""),
    (s, dir) =>
      T(s, dir, "part")
        .select(
          col("p_partkey"),
          // ASCII case-fold (T.asciiUpper): locale-full upper() diverges
          // cross-engine off the ASCII range (ß → SS vs ẞ)
          T.asciiUpper(col("p_name")).as("name_upper"),
          length(col("p_name")).cast("long").as("name_len"), // DuckDB length() is BIGINT
          substring_index(col("p_name"), " ", 1).as("first_word"),
          when(instr(col("p_name"), " ") > 0,
            // T.ustrip for contract consistency with the parity record
            // splits — identity on this ASCII column, robust otherwise
            T.ustrip(expr("substring(p_name, instr(p_name, ' ') + 1)")))
            .otherwise("").as("rest_words"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"))

  /** Date bucketing + extraction (§2.9; feeds E5 streaming analogs). */
  private val qDateFuncs = GraftQuery(
    "q_date_buckets",
    "date_trunc/year/month bucketing + agg (§2.9)",
    Some(s"""
      SELECT CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
        CAST(extract(month FROM o_orderdate) AS INT) AS order_month,
        COUNT(*) AS n_orders,
        ${sqlDsum("o_totalprice")} AS total_spend
      FROM orders
      GROUP BY 1, 2
      ORDER BY 1, 2"""),
    (s, dir) =>
      T(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
        .orderBy("order_year", "order_month"))

  /** Conditional aggregation (pivot-shaped without PIVOT syntax). */
  private val qCasePivot = GraftQuery(
    "q_conditional_agg_pivot",
    "sum(CASE WHEN...) manual pivot by market segment (§2.4/§2.9)",
    Some(s"""
      SELECT n_name,
        ${sqlDec2Dbl(s"""SUM(CASE WHEN c_mktsegment = 'BUILDING'
          THEN ${sqlMoney("c_acctbal")} ELSE 0 END)""")} AS building_bal,
        ${sqlDec2Dbl(s"""SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
          THEN ${sqlMoney("c_acctbal")} ELSE 0 END)""")} AS automobile_bal,
        COUNT(*) AS n_customers
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""),
    (s, dir) =>
      T(s, dir, "customer")
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(when(col("c_mktsegment") === "BUILDING", money("c_acctbal"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("building_bal"),
          sum(when(col("c_mktsegment") === "AUTOMOBILE", money("c_acctbal"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("automobile_bal"),
          count(lit(1)).as("n_customers"))
        .orderBy("n_name"))

  /** Global order-by + limit (top-k, §2.7). */
  private val qTopGlobal = GraftQuery(
    "q_global_topk",
    "global ORDER BY ... LIMIT with deterministic tiebreak (§2.7)",
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 25"""),
    (s, dir) =>
      T(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25))

  /** CUBE over two dimensions with grouping() indicators (§2.4 grouping
    * sets — completes the rollup/cube/pivot trio). grouping() flags
    * disambiguate subtotal rows from genuine NULL keys. */
  private val qCube = GraftQuery(
    "q_cube_order_stats",
    "GROUP BY CUBE with grouping() indicators (§2.4)",
    Some(s"""
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        COUNT(*) AS n_orders, ${sqlDsum("o_totalprice")} AS total_spend
      FROM orders
      GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority"""),
    (s, dir) => {
      val src = T(s, dir, "orders")
      val main = src
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spend"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("g_status"), col("g_priority"), col("n_orders"), col("total_spend"))
      // empty-input standard `()` row — see qRollup's scaladoc (r18)
      val out =
        if (T.tableIsEmpty(s, dir, "orders"))
          main.unionByName(src
            .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
            .select(lit(null).cast("string").as("o_orderstatus"),
              lit(null).cast("string").as("o_orderpriority"),
              lit(1).as("g_status"), lit(1).as("g_priority"),
              col("n_orders"), col("total_spend")))
        else main
      out.orderBy("g_status", "g_priority", "o_orderstatus", "o_orderpriority")
    })

  /** Register orders/lineitem as parquet tables bucketed (8 buckets,
    * sorted) on the join key — the co-located-join layout a real
    * deployment materializes once and amortizes over every downstream
    * orderkey join. Idempotent per session (catalog check); data lives
    * under java.io.tmpdir, never the repo. */
  // serializes check-then-write below (two threads could both see the
  // table missing and race the same saveAsTable) and remembers what this
  // JVM created so dropBucketedTables can release it at session end
  private val bucketedLock = new Object
  private val bucketedCreated =
    scala.collection.mutable.LinkedHashMap[(SparkSession, String), String]()

  private[graft] def bucketedOrderTables(s: SparkSession, dir: String): (String, String) = {
    // identity = full sanitized dir (hashCode could collide two dirs onto
    // one table) + pid (a fixed shared path would let a concurrent JVM's
    // overwrite race this one's scan)
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_") + "_p" + ProcessHandle.current().pid()
    val (ot, lt) = (s"orders_bkt_$tag", s"lineitem_bkt_$tag")
    def write(name: String, src: String, key: String): Unit = bucketedLock.synchronized {
      if (!s.catalog.tableExists(name)) {
        val path = s"${sys.props("java.io.tmpdir")}/graft_bucketed_${name}"
        T(s, dir, src).write.format("parquet")
          .bucketBy(8, key).sortBy(key)
          .option("path", path)
          .mode("overwrite").saveAsTable(name)
        bucketedCreated((s, name)) = path
      }
    }
    write(ot, "orders", "o_orderkey")
    write(lt, "lineitem", "l_orderkey")
    (ot, lt)
  }

  /** Drop every bucketed table this JVM created for `s` and delete its
    * tmpdir data. Called at END of session (Bench/Verify main, test
    * afterAll) — not between bench passes, since the whole point of the
    * bucketed layout is that the write cost is paid once and amortized. */
  private[graft] def dropBucketedTables(s: SparkSession): Unit = bucketedLock.synchronized {
    bucketedCreated.keys.filter(_._1 eq s).toList.foreach { k =>
      val path = bucketedCreated.remove(k).get
      s.sql(s"DROP TABLE IF EXISTS ${k._2}")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toList.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(path))
    }
  }

  /** Fact-fact join over BUCKETED tables (§2.3's orders⋈lineitem, laid
    * out the way a 100 TB warehouse stores it): both sides bucketed+
    * sorted on the join key with matching bucket counts, so the
    * sort-merge join reads co-located buckets and plans NO exchange on
    * either side — the shuffle that dominates a naive fact-fact join is
    * paid once at write time and amortized over every query. The spec
    * (BucketedJoinSpec) asserts the join subtree is exchange-free and
    * that results match the unbucketed twin; the oracle runs the same
    * join on the raw parquet. */
  private val qBucketedJoin = GraftQuery(
    "q_bucketed_join",
    "co-located bucketed fact-fact join, zero-exchange SMJ (§2.3)",
    Some(s"""
      SELECT o_orderpriority,
             count(DISTINCT o_orderkey) AS n_orders,
             ${sqlDsum("l_quantity")} AS total_qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, dir) => {
      val (ot, lt) = bucketedOrderTables(s, dir)
      s.table(ot)
        .filter(col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
          col("o_orderdate") < expr("timestamp'1996-01-01 00:00:00'"))
        .join(s.table(lt), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          dsum(col("l_quantity")).as("total_qty"))
        .orderBy("o_orderpriority")
    })

  def queries: Seq[GraftQuery] = Seq(
    q1, q3, q5, qSemi, qAnti, qWindowTopk, qWindowRunning, qRollup,
    qDistinctAgg, qSetOps, qScalarFuncs, qDateFuncs, qCasePivot, qTopGlobal,
    qCube, qBucketedJoin)
}
