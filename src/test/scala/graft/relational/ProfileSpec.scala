package graft.relational

import graft.{Registry, SparkSpec, T}
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("q_profile_stats: per-column stats agree with direct single-column queries") {
    val li = T(spark, sfDir, "lineitem")
    val n = li.count()
    val out = Registry.byName("q_profile_stats").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap

    out.keySet shouldBe Set(
      "l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus")
    out.values.foreach { r =>
      r.getLong(1) shouldBe n // n_rows: same single scan saw every row
      r.getLong(2) shouldBe 0L // synthetic data has no nulls
      // min <= max NUMERICALLY for the decimal-rendered columns,
      // lexically for the categorical ones (round-8 fix: min/max
      // aggregate the typed value, not its string rendering)
      val (lo, hi) = (r.getString(4), r.getString(5))
      if (lo.contains('.')) BigDecimal(lo) should be <= BigDecimal(hi)
      else lo should be <= hi
    }
    // spot-check one numeric and one categorical against direct queries
    out("l_returnflag").getLong(3) shouldBe
      li.select(col("l_returnflag")).distinct().count()
    out("l_quantity").getString(4) shouldBe
      li.agg(min(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0).toString
    // the round-8 regression case: max must be the NUMERIC max, not the
    // lexicographic one ("9.00" > "50.00" as strings)
    out("l_quantity").getString(5) shouldBe
      li.agg(max(col("l_quantity").cast("decimal(18,2)"))).head.getDecimal(0).toString
  }

  test("q_corr_matrix: exact-moment corr agrees with Spark's corr(); cov with covar_samp") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = Registry.byName("q_corr_matrix").run(spark, sfDir).collect()
    rows.length shouldBe 9 // 3 return flags x 3 pairs
    val cols = Map(
      "quantity~extendedprice" -> ("l_quantity", "l_extendedprice"),
      "quantity~discount" -> ("l_quantity", "l_discount"),
      "extendedprice~discount" -> ("l_extendedprice", "l_discount"))
    rows.foreach { r =>
      val (rf, pair) = (r.getString(0), r.getString(1))
      val (x, y) = cols(pair)
      val ref = li.filter(col("l_returnflag") === rf)
        .agg(corr(col(x), col(y)), covar_samp(col(x), col(y)))
        .collect()(0)
      withClue(s"$rf/$pair: ") {
        r.getDouble(2) should be >= -1.0
        r.getDouble(2) should be <= 1.0
        // the estimator's float path differs; agreement is statistical
        r.getDouble(2) shouldBe ref.getDouble(0) +- 1e-6
        r.getDouble(3) shouldBe ref.getDouble(1) +- math.abs(ref.getDouble(1)) * 1e-6
      }
    }
  }

  test("q_approx_quantile_audit: sketch stays inside a tight error envelope") {
    val rows = Registry.byName("q_approx_quantile_audit").run(spark, sfDir).collect()
    rows.length shouldBe 6 // 2 measures x 3 quantiles
    rows.foreach { r =>
      withClue(s"${r.getString(0)} p${r.getDouble(1)}: ") {
        // accuracy=10000 bounds rank error at ~n/10000; at spec scale the
        // sketch is effectively exact — allow a generous 1% relative slack
        r.getDouble(4) should be <= 0.01
        r.getDouble(2) should be > 0.0 // approx value is a real measure value
      }
    }
  }
}
