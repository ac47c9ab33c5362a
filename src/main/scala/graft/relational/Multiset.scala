package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational wave (extension family E6): multiset set operations
  * (INTERSECT ALL / EXCEPT ALL), ratio-to-report percent-of-total
  * windows, and deterministic two-phase stratified sampling — the
  * remaining ANSI/warehouse surface past Relational/Advanced.
  *
  * Determinism discipline matches the rest of E6: decimal-exact money
  * sums before any ratio, unique tie-breaks on every ordering, and a
  * multiplicative integer "hash" (computable identically in Spark and
  * DuckDB) wherever pseudo-random placement is needed — engine-native
  * hash functions differ between engines and can never be oracle-paired.
  */
object Multiset {

  import T._

  /** INTERSECT ALL / EXCEPT ALL — bag semantics (SURVEY §2.8 lists only
    * the distinct set ops as covered by q_set_ops; these are the
    * multiset duplicates-preserving variants). Order priorities of H1-
    * vs H2-1997 orders: intersect-all keeps min(n_a, n_b) copies per
    * value, except-all keeps max(n_a - n_b, 0). The result is collapsed
    * to (op, value, n) counts because a bag has no deterministic row
    * order to hash.
    *
    * Scale: Spark plans both ops as a count-aggregate + generate
    * replication, shuffling on the row value — here a 5-value key with
    * large multiplicities, the partial/final agg absorbs the skew. */
  private val multisetOps = GraftQuery(
    "q_multiset_ops",
    "INTERSECT ALL / EXCEPT ALL bag semantics over order priorities (E6 §2.8)",
    Some("""
      WITH a AS (
        SELECT o_orderpriority AS prio FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'),
      b AS (
        SELECT o_orderpriority AS prio FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'),
      i AS (SELECT prio FROM a INTERSECT ALL SELECT prio FROM b),
      e AS (SELECT prio FROM a EXCEPT ALL SELECT prio FROM b)
      SELECT op, prio, n FROM (
        SELECT 'intersect_all' AS op, prio, COUNT(*) AS n FROM i GROUP BY prio
        UNION ALL
        SELECT 'except_all' AS op, prio, COUNT(*) AS n FROM e GROUP BY prio)
      ORDER BY op, prio"""),
    (s, dir) => {
      val orders = T(s, dir, "orders")
      def half(lo: String, hi: String) = orders
        .filter(col("o_orderdate") >= expr(s"timestamp'$lo'") &&
          col("o_orderdate") < expr(s"timestamp'$hi'"))
        .select(col("o_orderpriority").as("prio"))
      val a = half("1997-01-01 00:00:00", "1997-07-01 00:00:00")
      val b = half("1997-07-01 00:00:00", "1998-01-01 00:00:00")
      val inter = a.intersectAll(b).groupBy(col("prio"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val diff = a.exceptAll(b).groupBy(col("prio"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      inter.unionByName(diff)
        .select(col("op"), col("prio"), col("n"))
        .orderBy("op", "prio")
    })

  /** Ratio-to-report: each nation's revenue as a share of its region and
    * of the grand total. The window runs over the ALREADY-AGGREGATED
    * nation frame (25 rows by schema constant — not SF-scaled), so the
    * unpartitioned total window is safe at any scale; the heavy lifting
    * (orders⋈customer) shuffles on custkey and aggregates partial+final
    * before the tiny window sees a row. Shares divide two exact decimal
    * sums cast to double — one IEEE division, bit-identical in both
    * engines. */
  private val percentOfTotal = GraftQuery(
    "q_percent_of_total",
    "nation revenue share of region + grand total via ratio-to-report windows (E6 §2.6)",
    Some(s"""
      WITH nrev AS (
        SELECT r_name, n_name, SUM(${sqlMoney("o_totalprice")}) AS rev
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name)
      SELECT r_name, n_name,
        ${sqlDec2Dbl("rev")} AS revenue,
        ${sqlDec2Dbl("rev")} / ${sqlDec2Dbl("SUM(rev) OVER (PARTITION BY r_name)")} AS share_region,
        ${sqlDec2Dbl("rev")} / ${sqlDec2Dbl("SUM(rev) OVER ()")} AS share_global
      FROM nrev
      ORDER BY r_name, n_name"""),
    (s, dir) => {
      val nrev = T(s, dir, "orders")
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(money("o_totalprice")).as("rev"))
      nrev
        .withColumn("share_region",
          col("rev").cast("double") /
            sum(col("rev")).over(Window.partitionBy(col("r_name"))).cast("double"))
        .withColumn("share_global",
          col("rev").cast("double") /
            sum(col("rev")).over(Window.partitionBy()).cast("double"))
        .select(col("r_name"), col("n_name"), col("rev").cast("double").as("revenue"),
          col("share_region"), col("share_global"))
        .orderBy("r_name", "n_name")
    })

  /** Multiplicative Knuth hash of the order key: pseudo-uniform over
    * [0, 2^32), identical arithmetic in Spark and DuckDB. The naive
    * spelling `(o_orderkey * 2654435761) % 4294967296` overflows a
    * BIGINT once o_orderkey exceeds ~3.47e9 — keys a 100 TB orders
    * table actually reaches, and ANSI Spark throws ARITHMETIC_OVERFLOW
    * instead of wrapping (caught by the round-11 ScaleProbe full-
    * registry sweep at 8×, where replica key offsets cross the line).
    * So the multiplier is SPLIT at 2^16 (2654435761 = 40503·2^16 +
    * 31153) and the product assembled mod 2^32 from two ≤2^48 partial
    * products — value-identical to the naive spelling for EVERY key
    * (a·b ≡ a·b0 + ((a·b1) mod 2^16)·2^16 (mod 2^32)), overflow-free
    * for the whole BIGINT domain, and still one flat integer
    * expression both engines evaluate bit-identically. */
  private[relational] val hashExpr =
    "((o_orderkey % 4294967296) * 31153 + " +
      "((o_orderkey % 4294967296) * 40503 % 65536) * 65536) % 4294967296"

  /** Deterministic exact-count stratified sample, 10% per stratum
    * (o_orderpriority). The naive formulation ranks EVERY row per
    * stratum — with 5 strata that's 5 whole-table sort tasks, a
    * scale-killer. This is the two-phase plan:
    *
    *   1. per-stratum counts (tiny aggregate, broadcast) give the exact
    *      target k = ceil(n/10) as integer arithmetic ((n+9) div 10 —
    *      never ceil(0.1·n): 0.1 is not FP-exact and the product can
    *      land an ulp above an integer, flipping ceil between engines);
    *   2. a cheap prefilter keeps rows whose hash falls under 1.25×
    *      the target rate (h < 0.125·2^32), shrinking the sort input
    *      8×; the exact row_number rank runs over the survivors only.
    *
    * The oracle mirrors BOTH phases verbatim, so the result is
    * identical by construction (the prefilter is part of the operator's
    * spec, not an approximation bolted on). */
  private val stratifiedSample = GraftQuery(
    "q_stratified_sample",
    "exact 10%-per-stratum sample via hash prefilter + rank, two-phase (E6 §2.7)",
    Some(s"""
      WITH tgt AS (
        SELECT o_orderpriority, CAST((COUNT(*) + 9) // 10 AS BIGINT) AS k
        FROM orders GROUP BY o_orderpriority),
      cand AS (
        SELECT o_orderpriority, o_orderkey, $hashExpr AS h
        FROM orders
        WHERE $hashExpr < 536870912),
      ranked AS (
        SELECT c.o_orderpriority, c.o_orderkey, t.k,
          ROW_NUMBER() OVER (PARTITION BY c.o_orderpriority
                             ORDER BY c.h, c.o_orderkey) AS rn
        FROM cand c JOIN tgt t ON c.o_orderpriority = t.o_orderpriority)
      SELECT o_orderpriority, o_orderkey
      FROM ranked WHERE rn <= k
      ORDER BY o_orderpriority, o_orderkey"""),
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val tgt = orders.groupBy(col("o_orderpriority"))
        .agg(expr("(count(1) + 9) div 10").as("k"))
      val cand = orders
        .withColumn("h", expr(hashExpr))
        .filter(col("h") < 536870912L)
        .select(col("o_orderpriority"), col("o_orderkey"), col("h"))
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("h"), col("o_orderkey"))
      cand
        .join(broadcast(tgt), "o_orderpriority")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("k"))
        .select(col("o_orderpriority"), col("o_orderkey"))
        .orderBy("o_orderpriority", "o_orderkey")
    })

  /** Approximate COUNT(DISTINCT) audit: HyperLogLog++ estimate next to
    * the exact count, with the relative error. At 100 TB the approx
    * variant is the only affordable way to watch distinct cardinality
    * per slice — the sketch merges map-side (no shuffle of the raw
    * keys, unlike exact distinct which must co-locate every key).
    * Rows-only contract: the HLL++ estimate is implementation-specific
    * (DuckDB's approx_count_distinct uses a different sketch), so
    * there is no cross-engine oracle; MultisetSpec bounds the error
    * against the exact twin instead. */
  private val approxDistinct = GraftQuery(
    "q_approx_distinct_audit",
    "approx_count_distinct (HLL++) vs exact per returnflag, rel error (E6 §2.4, approx)",
    None,
    (s, dir) => {
      // the sketch and the exact count aggregate SEPARATELY and join on
      // the 3-row group key: mixing a distinct and a non-distinct
      // aggregate in one agg plans an Expand that doubles every fact row
      // through the shuffle (measured ~2x on this query); split, each
      // side is a plain two-phase aggregate and the join is free
      val li = T(s, dir, "lineitem")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_nd"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("exact_nd"))
      approx.join(exact, "l_returnflag")
        .withColumn("rel_err",
          round(abs(col("approx_nd") - col("exact_nd")).cast("double") /
            col("exact_nd").cast("double"), 6))
        .select(col("l_returnflag"), col("approx_nd"), col("exact_nd"), col("rel_err"))
        .orderBy("l_returnflag")
    })

  /** Correlated LATERAL subquery join: per region, the top-2 nations by
    * customer count — the "top-N related rows per outer row" shape that
    * LATERAL expresses directly and Catalyst decorrelates into a
    * window-ranked join (no per-outer-row re-execution; the subquery
    * aggregates once, shuffled on its own keys). Spelled in SQL on both
    * sides: LATERAL is a parser-level feature with no DataFrame-API
    * equivalent. */
  private val lateralTopN = GraftQuery(
    "q_lateral_topn",
    "LATERAL correlated top-2-per-region subquery join (E6 §2.3)",
    Some("""
      SELECT r.r_name, l.n_name, l.n_custs
      FROM region r,
      LATERAL (
        SELECT n_name, COUNT(*) AS n_custs
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        WHERE n_regionkey = r.r_regionkey
        GROUP BY n_name
        ORDER BY n_custs DESC, n_name
        LIMIT 2
      ) l
      ORDER BY r.r_name, l.n_custs DESC, l.n_name"""),
    (s, dir) => {
      // view names scoped by the md5-derived dir key (T.scratchKey —
      // a sanitized dir string is LOSSY: '/a.b' and '/a_b' would map
      // to the same tag): session temp views are session-global, so
      // colliding names would let two run() calls with different dirs
      // in ONE session race createOrReplace against the other call's
      // analysis
      val tag = graft.T.scratchKey(dir)
      T(s, dir, "region").createOrReplaceTempView(s"graft_lat_region_$tag")
      T(s, dir, "nation").createOrReplaceTempView(s"graft_lat_nation_$tag")
      T(s, dir, "customer").createOrReplaceTempView(s"graft_lat_customer_$tag")
      s.sql(s"""
        SELECT r.r_name, l.n_name, l.n_custs
        FROM graft_lat_region_$tag r,
        LATERAL (
          SELECT n_name, COUNT(*) AS n_custs
          FROM graft_lat_nation_$tag JOIN graft_lat_customer_$tag
            ON c_nationkey = n_nationkey
          WHERE n_regionkey = r.r_regionkey
          GROUP BY n_name
          ORDER BY n_custs DESC, n_name
          LIMIT 2
        ) l
        ORDER BY r.r_name, l.n_custs DESC, l.n_name""")
    })

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): the '5-LOW'
    * priority is mapped to NULL on both sides, so a plain equi-join
    * would silently DROP that group (NULL = NULL is NULL); the
    * null-safe operator matches it. This is the canonical
    * dimension-with-unknown-bucket merge. */
  private val nullSafeJoin = GraftQuery(
    "q_null_safe_join",
    "null-safe <=> join on a nullable priority key (E6 §2.3)",
    Some("""
      WITH a AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS prio, COUNT(*) AS n_a
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1),
      b AS (
        SELECT nullif(o_orderpriority, '5-LOW') AS prio, COUNT(*) AS n_b
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1)
      SELECT a.prio, a.n_a, b.n_b
      FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
      ORDER BY a.prio NULLS FIRST"""),
    (s, dir) => {
      val orders = T(s, dir, "orders")
      val cutoff = expr("timestamp'1997-01-01 00:00:00'")
      def half(pred: Column, n: String) = orders.filter(pred)
        .groupBy(expr("nullif(o_orderpriority, '5-LOW')").as("prio"))
        .agg(count(lit(1)).as(n))
      val a = half(col("o_orderdate") < cutoff, "n_a")
      val b = half(col("o_orderdate") >= cutoff, "n_b")
        .withColumnRenamed("prio", "prio_b")
      a.join(b, col("prio") <=> col("prio_b"))
        .select(col("prio"), col("n_a"), col("n_b"))
        .orderBy(col("prio").asc_nulls_first)
    })

  /** Array higher-order functions (filter/exists/forall) — all codegen'd
    * builtins, no UDF. The oracle spells exists/forall through
    * list_filter counts (the engine-neutral expansion). */
  private val hofAudit = GraftQuery(
    "q_hof_array_audit",
    "array filter/exists/forall over tokenized part names (§2.9)",
    Some("""
      SELECT p_partkey,
        CAST(len(list_filter(string_split(p_name, ' '), t -> len(t) > 4)) AS INT) AS n_long_toks,
        len(list_filter(string_split(p_name, ' '), t -> t = 'red')) > 0 AS any_red,
        len(list_filter(string_split(p_name, ' '), t -> len(t) > 10)) = 0 AS all_short
      FROM part
      ORDER BY p_partkey"""),
    (s, dir) =>
      T(s, dir, "part")
        .withColumn("toks", split(col("p_name"), " ", -1))
        .select(col("p_partkey"),
          size(filter(col("toks"), t => length(t) > 4)).as("n_long_toks"),
          exists(col("toks"), t => t === "red").as("any_red"),
          forall(col("toks"), t => length(t) <= 10).as("all_short"))
        .orderBy("p_partkey"))

  def queries: Seq[GraftQuery] =
    Seq(multisetOps, percentOfTotal, stratifiedSample, approxDistinct,
      lateralTopN, nullSafeJoin, hofAudit)
}
