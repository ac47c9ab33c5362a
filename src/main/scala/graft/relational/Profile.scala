package graft.relational

import graft.{GraftQuery, T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling / data-quality statistics (extension family E6,
  * continued): the "what is in this table" pass every ingestion pipeline
  * runs before trusting a new drop — per-column null rates, cardinality,
  * and value ranges — plus the approximate-quantile audit that justifies
  * replacing exact percentiles with sketches at scale.
  *
  * Scale notes: the profile is ONE scan of the fact table producing one
  * row of partial aggregates per column (count / nulls / distinct / min
  * / max are all algebraic or Expand-based), then a constant-sized
  * unpivot — profiling 100 TB costs exactly one pass regardless of how
  * many columns are profiled. The quantile audit compares
  * `approx_percentile` (GK sketch, mergeable, one pass) against the
  * exact sort-based percentile; at 100 TB only the sketch is viable, so
  * the audit's error envelope is what licenses it.
  */
object Profile {

  private def lineitem(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")

  /** Numeric measures profiled through an exact-2-decimal string view. */
  private val numericCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** One profiled column: a TYPED ordering view (min/max must compare
    * numerically — aggregating over a string rendering would order
    * "9.00" above "50.00") and a post-aggregate rendering that turns
    * the typed extreme into an engine-identical string. Numerics order
    * as DECIMAL(18,2) and render fixed-scale ("1.00"), never
    * shortest-round-trip doubles; strings order and render as-is.
    * The decimal view is [[T.money]]-guarded on BOTH sides: a
    * non-finite or beyond-capacity measure has no exact-decimal
    * reading (Spark's raw cast nulls where DuckDB's throws), so such
    * values are MISSING from min/max by the moneyRange contract —
    * n_null still counts only genuine NULLs of the raw column. */
  private case class Prof(name: String, ord: Column, render: Column => Column,
      ordSql: String, renderSql: String => String)

  private val profiled: Seq[Prof] =
    numericCols.map(c =>
      Prof(c, T.money(col(c)), _.cast("string"),
        T.sqlMoney(c), e => s"CAST($e AS VARCHAR)")) ++
      Seq(
        Prof("l_returnflag", col("l_returnflag"), identity, "l_returnflag", identity),
        Prof("l_linestatus", col("l_linestatus"), identity, "l_linestatus", identity))

  /** Column profile of lineitem, one output row per column.
    *
    * Plan shape: one column-PRUNED scan per profiled column, each
    * aggregating count / nulls / distinct / min / max for just that
    * column, unioned. On columnar storage this reads each profiled
    * column's bytes exactly once — the same total I/O as a single
    * all-column scan — while every aggregate stays a simple two-phase
    * partial/final (a lone COUNT(DISTINCT) needs no Expand). The
    * alternative single-scan formulation with five COUNT(DISTINCT)s in
    * one aggregate compiles to a x5 Expand that multiplies every row
    * through the shuffle — measured 6x slower at sf0.1, and strictly
    * worse at 100 TB where the shuffle dwarfs the scan. The union's
    * branches share no state and run concurrently in one job. */
  private val profileStats = GraftQuery(
    "q_profile_stats",
    "per-column profile via pruned scans: rows/nulls/distinct/min/max, unioned (E6)",
    Some {
      val selects = profiled.map { p =>
        s"""
        SELECT '${p.name}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN ${p.name} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               COUNT(DISTINCT ${p.name}) AS n_distinct,
               ${p.renderSql(s"MIN(${p.ordSql})")} AS min_value,
               ${p.renderSql(s"MAX(${p.ordSql})")} AS max_value
        FROM lineitem"""
      }
      selects.mkString(" UNION ALL ") + " ORDER BY column_name"
    },
    (s, dir) => {
      val perColumn = profiled.map { p =>
        lineitem(s, dir)
          .select(col(p.name), p.ord.as("ov")) // prunes the scan to one column
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col(p.name).isNull, 1L).otherwise(0L)).as("n_null"),
            countDistinct(col(p.name)).as("n_distinct"),
            p.render(min(col("ov"))).as("min_value"),
            p.render(max(col("ov"))).as("max_value"))
          .select(lit(p.name).as("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }
      perColumn.reduce(_ unionAll _).orderBy(col("column_name"))
    })

  /** Approximate-quantile audit: GK-sketch `approx_percentile` vs the
    * exact percentile for p50/p90/p99 of two measures, with the
    * relative error in the output. No SQL oracle — DuckDB's approx
    * sketch is a different algorithm, so cross-engine hashes cannot
    * match by construction; the driver records rows>0 and
    * ProfileSpec pins the error envelope (rel_err well under the 1e-4
    * accuracy the call requests) plus exact-value agreement with the
    * sort-based formulation. */
  private val quantileAudit = GraftQuery(
    "q_approx_quantile_audit",
    "approx_percentile vs exact percentiles with relative-error audit (E6; rows-only)",
    None,
    (s, dir) => {
      val qs = Seq(0.5, 0.9, 0.99)
      val measures = Seq("l_extendedprice", "l_quantity")
      val aggs = measures.flatMap { m =>
        Seq(
          expr(s"approx_percentile($m, array(${qs.mkString(", ")}), 10000)")
            .as(s"${m}__approx"),
          expr(s"percentile($m, array(${qs.mkString(", ")}))").as(s"${m}__exact"))
      }
      val one = lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
      val rows = measures.flatMap { m =>
        qs.zipWithIndex.map { case (q, i) =>
          struct(
            lit(m).as("measure"),
            lit(q).as("quantile"),
            col(s"${m}__approx").getItem(i).cast("double").as("approx_value"),
            col(s"${m}__exact").getItem(i).cast("double").as("exact_value"))
        }
      }
      one.select(inline(array(rows: _*)))
        .withColumn("rel_err",
          when(col("exact_value") === 0d, lit(0d))
            .otherwise(abs(col("approx_value") - col("exact_value")) /
              abs(col("exact_value"))))
        .orderBy(col("measure"), col("quantile"))
    })

  /** Pairwise correlation + sample covariance of the three numeric
    * measures, per return flag, from EXACT decimal moment sums.
    *
    * Why not `corr()`: both engines implement streaming single-pass
    * estimators whose floating-point accumulation order differs run to
    * run and engine to engine — cross-engine hash equality is impossible
    * by construction. Instead ONE scan accumulates the classic moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) as exact decimals (inputs are 2-dp
    * money/quantity values, so products at scale 4 are exact), then the
    * corr/cov formulas run on doubles derived from those exact sums —
    * every arithmetic step is deterministic IEEE with an identical
    * expression tree on both engines, so results are bit-identical.
    * The decimal→double step itself must be correctly rounded on BOTH
    * sides for that to hold — the oracle spells it [[T.sqlDec2Dbl]]
    * (see there: DuckDB's direct cast double-rounds past 2^53, caught
    * by this very query at the sf0.001 gate). The
    * constant-width aggregate is partial/final (no Expand), and adding
    * measures grows the row width, not the pass count — the same
    * one-scan posture as `q_profile_stats`.
    */
  private val corrMatrix = GraftQuery(
    "q_corr_matrix",
    "pairwise corr/cov matrix from exact decimal moment sums, one scan (E6)",
    Some {
      def pairSel(label: String, sx: String, sy: String,
          sxx: String, syy: String, sxy: String): String =
        s"""SELECT rf AS l_returnflag, '$label' AS pair,
               (n * $sxy - $sx * $sy)
                 / NULLIF(sqrt(GREATEST(n * $sxx - $sx * $sx, 0)
                             * GREATEST(n * $syy - $sy * $sy, 0)), 0) AS corr_val,
               (n * $sxy - $sx * $sy) / NULLIF(n * (n - 1), 0) AS cov_val
            FROM a"""
      s"""
      WITH d AS (
        SELECT l_returnflag AS rf,
               CAST(l_quantity AS DECIMAL(18,2)) AS xq,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS xp,
               CAST(l_discount AS DECIMAL(18,2)) AS xd
        FROM lineitem
        WHERE ${T.sqlMoneyRange("l_quantity")}
          AND ${T.sqlMoneyRange("l_extendedprice")}
          AND ${T.sqlMoneyRange("l_discount")}),
      a AS (
        SELECT rf,
               CAST(COUNT(*) AS DOUBLE) AS n,
               ${T.sqlDec2Dbl("SUM(xq)")} AS sq,
               ${T.sqlDec2Dbl("SUM(xp)")} AS sp,
               ${T.sqlDec2Dbl("SUM(xd)")} AS sd,
               ${T.sqlDec2Dbl("SUM(CAST(xq * xq AS DECIMAL(30,4)))")} AS sqq,
               ${T.sqlDec2Dbl("SUM(CAST(xp * xp AS DECIMAL(30,4)))")} AS spp,
               ${T.sqlDec2Dbl("SUM(CAST(xd * xd AS DECIMAL(30,4)))")} AS sdd,
               ${T.sqlDec2Dbl("SUM(CAST(xq * xp AS DECIMAL(30,4)))")} AS sqp,
               ${T.sqlDec2Dbl("SUM(CAST(xq * xd AS DECIMAL(30,4)))")} AS sqd,
               ${T.sqlDec2Dbl("SUM(CAST(xp * xd AS DECIMAL(30,4)))")} AS spd
        FROM d GROUP BY rf)
      ${pairSel("extendedprice~discount", "sp", "sd", "spp", "sdd", "spd")}
      UNION ALL
      ${pairSel("quantity~discount", "sq", "sd", "sqq", "sdd", "sqd")}
      UNION ALL
      ${pairSel("quantity~extendedprice", "sq", "sp", "sqq", "spp", "sqp")}
      ORDER BY l_returnflag, pair"""
    },
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def dec(c: String): Column = col(c).cast(DecimalType(18, 2))
      def prod(x: String, y: String): Column =
        (dec(x) * dec(y)).cast(DecimalType(30, 4))
      // ROW-level moneyRange guard (WHERE in the oracle): correlation
      // needs PAIRED observations, so a row with any non-representable
      // measure is dropped whole — per-cell nulling would skew Σxy
      // against Σx/Σy. Identity on representable data; keeps the raw
      // cast below exact (inputs are guaranteed in-range past the
      // filter), where Spark nulls and DuckDB throws on poison.
      // layout-adaptive scan rebalance (T.scanRebalanced — opt-in,
      // no-op at production row-group counts): the ten exact decimal
      // products/sums above this scan are the query's heavy map work;
      // projected to the 4 consumed columns before the exchange.
      // Measured 1.9 → 1.5 s at sf0.1/local[32], identical moments.
      val a = T.scanRebalanced(s, lineitem(s, dir)
          .select((col("l_returnflag") +: numericCols.map(col)): _*)
          .filter(numericCols.map(c => T.moneyRange(col(c))).reduce(_ && _)))
        .groupBy(col("l_returnflag").as("rf")).agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec("l_quantity")).cast("double").as("sq"),
        sum(dec("l_extendedprice")).cast("double").as("sp"),
        sum(dec("l_discount")).cast("double").as("sd"),
        sum(prod("l_quantity", "l_quantity")).cast("double").as("sqq"),
        sum(prod("l_extendedprice", "l_extendedprice")).cast("double").as("spp"),
        sum(prod("l_discount", "l_discount")).cast("double").as("sdd"),
        sum(prod("l_quantity", "l_extendedprice")).cast("double").as("sqp"),
        sum(prod("l_quantity", "l_discount")).cast("double").as("sqd"),
        sum(prod("l_extendedprice", "l_discount")).cast("double").as("spd"))
      def pairRow(label: String, sx: String, sy: String,
          sxx: String, syy: String, sxy: String) = {
        val n = col("n")
        val num = n * col(sxy) - col(sx) * col(sy)
        // zero denominators (single-row or zero-variance group) emit
        // NULL explicitly on BOTH sides (NULLIF in the oracle): DuckDB's
        // IEEE float division would yield NaN/Inf where Spark's non-ANSI
        // Divide yields NULL — a latent cross-engine flake on degenerate
        // groups that current fixtures happen to avoid
        def safeDiv(d: Column): Column =
          num / when(d === 0d, lit(null)).otherwise(d)
        // variance terms clamp at 0 on BOTH sides (GREATEST in the
        // oracle): a single-row group's n·Σx² − (Σx)² is 0 in exact
        // arithmetic but can land one ulp NEGATIVE after the two
        // decimal→double conversions, and sqrt(−ε) is NaN in Spark but
        // an ERROR in DuckDB (measured, round-11 one-row gate).
        // Identity for any group with real variance.
        def varc(sxx: String, sx: String): Column =
          greatest(n * col(sxx) - col(sx) * col(sx), lit(0d))
        struct(
          lit(label).as("pair"),
          safeDiv(sqrt(varc(sxx, sx) * varc(syy, sy))).as("corr_val"),
          safeDiv(n * (n - lit(1))).as("cov_val"))
      }
      a.select(col("rf").as("l_returnflag"), inline(array(
          pairRow("extendedprice~discount", "sp", "sd", "spp", "sdd", "spd"),
          pairRow("quantity~discount", "sq", "sd", "sqq", "sdd", "sqd"),
          pairRow("quantity~extendedprice", "sq", "sp", "sqq", "spp", "sqp"))))
        .orderBy(col("l_returnflag"), col("pair"))
    })

  def queries: Seq[GraftQuery] = Seq(profileStats, quantileAudit, corrMatrix)
}
