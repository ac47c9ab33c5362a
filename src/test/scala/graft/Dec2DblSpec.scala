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

  test("no registry oracle direct-casts a decimal SUM to DOUBLE (static + generated)") {
    val offenders = Registry.all.flatMap { q =>
      val sqls = q.oracle.toSeq ++
        q.oracleGen.map(gen => gen(spark, sfDir)).toSeq
      sqls.flatMap(directDecimalSumCasts).map(m => s"${q.name}: $m")
    }
    withClue(offenders.mkString("\n")) { offenders shouldBe empty }
  }
}
