package graft

/** Pins the DECIMAL→DOUBLE oracle-conversion discipline ([[T.sqlDec2Dbl]]).
  *
  * Background (found by the first full oracle gate at sf0.001, round 11):
  * DuckDB's direct `CAST(dec AS DOUBLE)` converts the int128 payload to
  * double and then divides by 10^scale — two roundings — while Spark's
  * decimal cast (BigDecimal.doubleValue) is correctly rounded. Once the
  * scaled payload exceeds 2^53 the two can differ in the last ulp:
  * group A's Σ(l_extendedprice²) at sf0.001 is exactly 7096786968835.8685
  * (payload 7.1e16), which DuckDB's direct cast renders …869 where the
  * nearest double is …868. The fix is oracle-side spelling: route the
  * conversion through VARCHAR (exact digits, then a correctly-rounded
  * string→double parse), making the oracle bit-identical to Spark's cast
  * BY CONSTRUCTION at every magnitude.
  *
  * Three pins: (1) Spark's decimal→double cast IS correctly rounded on
  * the observed divergent value (the engine-side half of the contract);
  * (2) the helper emits the exact varchar-route spelling; (3) a lint
  * over every registry oracle rejects the direct
  * `CAST(SUM(…DECIMAL…) AS DOUBLE)` antipattern — like PlanSpec's
  * cartesian sweep, a regression here breaks `sbt test` instead of
  * waiting for a drifted gate to flake.
  */
class Dec2DblSpec extends SparkSpec {

  test("Spark's decimal->double cast is correctly rounded on the observed 2^53+ divergent value") {
    val viaDecimal = spark
      .sql("SELECT CAST(CAST('7096786968835.8685' AS DECIMAL(30,4)) AS DOUBLE) AS v")
      .head().getDouble(0)
    // the correctly-rounded double of the exact decimal digits
    val correct = java.lang.Double.parseDouble("7096786968835.8685")
    assert(java.lang.Double.doubleToLongBits(viaDecimal) ==
      java.lang.Double.doubleToLongBits(correct))
    // and the value genuinely straddles a rounding boundary: the
    // double-rounded neighbour DuckDB's direct cast produced is one ulp up
    assert(correct == 7096786968835.868d)
    assert(Math.nextUp(correct) == 7096786968835.869d)
  }

  test("sqlDec2Dbl emits the varchar-route spelling") {
    T.sqlDec2Dbl("SUM(x)") shouldBe "CAST(CAST((SUM(x)) AS VARCHAR) AS DOUBLE)"
    // the inner money cast carries the representability guard (NaN/Inf
    // and beyond-DECIMAL(18,2) magnitudes are MISSING in exact
    // aggregation — NonFiniteInputSpec) and the outer conversion keeps
    // the varchar route
    T.sqlDsum("v") shouldBe
      ("CAST(CAST((SUM(CAST(CASE WHEN (isfinite(CAST((v) AS DOUBLE))" +
        " AND abs(CAST((v) AS DOUBLE)) < 1e16) THEN (v) END" +
        " AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE)")
  }

  /** Find `CAST(SUM(<args containing DECIMAL>)[ OVER (…)] AS DOUBLE)` in
    * `sql` via balanced-paren scanning (regex can't match the nesting).
    * The fixed spelling reads `CAST(CAST((SUM(` so it never matches. */
  private def directDecimalSumCasts(sql: String): Seq[String] = {
    val marker = "CAST(SUM("
    def balancedEnd(s: String, open: Int): Int = {
      var depth = 1; var i = open + 1
      while (depth > 0 && i < s.length) {
        if (s(i) == '(') depth += 1 else if (s(i) == ')') depth -= 1
        i += 1
      }
      i // position just past the close paren
    }
    Iterator.iterate(sql.indexOf(marker))(i => sql.indexOf(marker, i + 1))
      .takeWhile(_ >= 0)
      .flatMap { i =>
        val sumOpen = i + marker.length - 1
        val sumEnd = balancedEnd(sql, sumOpen)
        val sumArgs = sql.substring(sumOpen + 1, sumEnd - 1)
        // optional window clause between SUM(...) and the cast target
        var j = sumEnd
        while (j < sql.length && sql(j).isWhitespace) j += 1
        if (sql.regionMatches(j, "OVER", 0, 4)) {
          j += 4
          while (j < sql.length && sql(j).isWhitespace) j += 1
          if (j < sql.length && sql(j) == '(') j = balancedEnd(sql, j)
          while (j < sql.length && sql(j).isWhitespace) j += 1
        }
        val castAsDouble = sql.regionMatches(true, j, "AS DOUBLE", 0, 9)
        if (castAsDouble && sumArgs.toUpperCase.contains("DECIMAL"))
          Some(sql.substring(i, math.min(sql.length, j + 9)))
        else None
      }
      .toSeq
  }

  test("lint scaffolding: the scanner flags the antipattern and passes the fix") {
    directDecimalSumCasts(
      "CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)") should have size 1
    directDecimalSumCasts(
      "CAST(SUM(CAST(x AS DECIMAL(18,2))) OVER (PARTITION BY k) AS DOUBLE)") should have size 1
    directDecimalSumCasts(
      "CAST(CAST((SUM(CAST(x AS DECIMAL(18,2)))) AS VARCHAR) AS DOUBLE)") shouldBe empty
    directDecimalSumCasts("CAST(SUM(n) AS DOUBLE)") shouldBe empty // integer sum: exact
  }

  /** Find raw `CAST(<expr> AS DECIMAL(18,2))` money casts in `sql` that
    * carry no representability guard. On NaN/Inf or beyond-capacity
    * magnitudes Spark's cast NULLs where DuckDB's THROWS — the
    * divergence class [[T.sqlMoney]] exists to close. A cast is
    * allowed when: (a) its argument IS the guard (`CASE WHEN
    * (isfinite…` — the sqlMoney spelling); (b) the argument is a bare
    * numeric literal (always representable); or (c) the SQL carries a
    * row-level [[T.sqlMoneyRange]] guard on the same expression
    * (q_corr_matrix's WHERE — rows are pre-filtered representable, so
    * the downstream cast is exact by construction). */
  private def unguardedMoneyCasts(sql: String): Seq[String] = {
    val marker = "CAST("
    def balancedEnd(s: String, open: Int): Int = {
      var depth = 1; var i = open + 1
      while (depth > 0 && i < s.length) {
        if (s(i) == '(') depth += 1 else if (s(i) == ')') depth -= 1
        i += 1
      }
      i
    }
    // last depth-0 " AS " inside the cast body splits arg from target
    def splitCastBody(body: String): Option[(String, String)] = {
      var depth = 0; var last = -1; var i = 0
      while (i < body.length) {
        if (body(i) == '(') depth += 1
        else if (body(i) == ')') depth -= 1
        else if (depth == 0 && body.regionMatches(true, i, " AS ", 0, 4)) last = i
        i += 1
      }
      if (last < 0) None
      else Some((body.substring(0, last), body.substring(last + 4)))
    }
    // WHERE-guard escape hatch, scoped: a range guard excuses a raw cast
    // only when it appears in the cast's own SELECT/CTE block — the
    // smallest balanced-paren region containing the cast THAT IS a query
    // block (contains a SELECT keyword; whole query if none). The SELECT
    // filter matters: the raw smallest region around a cast wrapped in
    // SUM(...)/ROUND(...) is the function's argument list, which can
    // never contain the block's WHERE guard and would falsely flag
    // legitimately guarded SQL. Without the scoping at all, a WHERE
    // guard on the same column in an UNRELATED CTE of the same query
    // would excuse a future unguarded cast (round-13 advisory).
    // Residual limitation, by construction: sibling branches of an
    // unparenthesized top-level UNION still share one block and can
    // excuse each other.
    def enclosingBlock(pos: Int): String = {
      var best = sql
      val stack = scala.collection.mutable.Stack[Int]()
      var i = 0
      while (i < sql.length) {
        if (sql(i) == '(') stack.push(i)
        else if (sql(i) == ')' && stack.nonEmpty) {
          val o = stack.pop()
          if (o <= pos && pos < i && (i + 1 - o) < best.length) {
            val region = sql.substring(o, i + 1)
            if (region.toUpperCase.contains("SELECT")) best = region
          }
        }
        i += 1
      }
      best
    }
    Iterator.iterate(sql.indexOf(marker))(i => sql.indexOf(marker, i + 1))
      .takeWhile(_ >= 0)
      .flatMap { i =>
        val open = i + marker.length - 1
        val end = balancedEnd(sql, open)
        val body = sql.substring(open + 1, end - 1)
        splitCastBody(body) match {
          case Some((arg, target))
              if target.replaceAll("\\s+", "").equalsIgnoreCase("DECIMAL(18,2)") =>
            val a = arg.trim
            val guarded = a.replaceAll("\\s+", " ").toUpperCase.startsWith("CASE WHEN (ISFINITE") ||
              a.matches("[-+]?[0-9.eE]+") ||
              enclosingBlock(i).contains(T.sqlMoneyRange(a))
            if (guarded) None else Some(sql.substring(i, end))
          case _ => None
        }
      }
      .toSeq
  }

  test("lint scaffolding: the money-cast scanner flags raw casts and passes guarded ones") {
    unguardedMoneyCasts("SUM(CAST(o_totalprice AS DECIMAL(18,2)))") should have size 1
    unguardedMoneyCasts(s"SUM(${T.sqlMoney("o_totalprice")})") shouldBe empty
    unguardedMoneyCasts("CASE WHEN x THEN CAST(0 AS DECIMAL(18,2)) END") shouldBe empty
    unguardedMoneyCasts(
      s"SELECT CAST(l_quantity AS DECIMAL(18,2)) FROM t WHERE ${T.sqlMoneyRange("l_quantity")}"
    ) shouldBe empty
    unguardedMoneyCasts("CAST(x AS DECIMAL(18,4))") shouldBe empty // other scales out of scope
    // guard scoping: a WHERE guard in an UNRELATED CTE must not excuse
    // a raw cast in a sibling CTE, but one in the SAME block must
    unguardedMoneyCasts(
      s"""WITH a AS (SELECT x FROM t WHERE ${T.sqlMoneyRange("l_quantity")}),
          b AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) FROM t)
          SELECT * FROM a, b""") should have size 1
    unguardedMoneyCasts(
      s"""WITH b AS (SELECT CAST(l_quantity AS DECIMAL(18,2)) FROM t
                     WHERE ${T.sqlMoneyRange("l_quantity")})
          SELECT * FROM b""") shouldBe empty
    // a guarded cast WRAPPED in a function must still see its block's
    // WHERE guard (the cast's smallest paren region is SUM's argument
    // list — the block resolver must skip non-SELECT regions)
    unguardedMoneyCasts(
      s"""WITH d AS (SELECT SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
                     FROM t WHERE ${T.sqlMoneyRange("l_quantity")})
          SELECT * FROM d""") shouldBe empty
  }

  test("no registry oracle raw-casts a money column to DECIMAL(18,2) without a guard") {
    val offenders = Registry.all.flatMap { q =>
      val sqls = q.oracle.toSeq ++
        q.oracleGen.map(gen => gen(spark, sfDir)).toSeq
      sqls.flatMap(unguardedMoneyCasts).map(m => s"${q.name}: $m")
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }

  test("no registry oracle direct-casts a decimal SUM to DOUBLE (static + generated)") {
    val offenders = Registry.all.flatMap { q =>
      val sqls = q.oracle.toSeq ++
        q.oracleGen.map(gen => gen(spark, sfDir)).toSeq
      sqls.flatMap(directDecimalSumCasts).map(m => s"${q.name}: $m")
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }
}
