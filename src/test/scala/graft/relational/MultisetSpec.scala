package graft.relational

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics checks for the third relational wave: multiset set-op
  * algebra, ratio-to-report shares, and the two-phase stratified
  * sample's exactness + determinism. */
class MultisetSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("q_multiset_ops: bag algebra min(a,b) / max(a-b,0) per value") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def counts(lo: String, hi: String) = orders
      .filter(col("o_orderdate") >= expr(s"timestamp'$lo'") &&
        col("o_orderdate") < expr(s"timestamp'$hi'"))
      .groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = counts("1997-01-01 00:00:00", "1997-07-01 00:00:00")
    val b = counts("1997-07-01 00:00:00", "1998-01-01 00:00:00")
    val got = run("q_multiset_ops").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (v <- (a.keySet ++ b.keySet)) {
      val inter = math.min(a.getOrElse(v, 0L), b.getOrElse(v, 0L))
      val diff = math.max(a.getOrElse(v, 0L) - b.getOrElse(v, 0L), 0L)
      got.getOrElse(("intersect_all", v), 0L) shouldBe inter
      got.getOrElse(("except_all", v), 0L) shouldBe diff
    }
  }

  test("q_percent_of_total: shares sum to 1 per region and globally") {
    val rows = run("q_percent_of_total").collect()
    val globalSum = rows.map(_.getAs[Double]("share_global")).sum
    globalSum shouldBe 1.0 +- 1e-9
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getAs[Double]("share_region")).sum shouldBe 1.0 +- 1e-9
    }
  }

  test("q_stratified_sample: exact per-stratum count, prefilter never starves") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val want = orders.groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> (r.getLong(1) + 9) / 10).toMap
    val got = run("q_stratified_sample").groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe want // ceil(n/10) sampled from every stratum — the 1.25×
    // prefilter left at least k candidates per stratum at this SF
  }

  test("stratified-sample hash: overflow-free over the whole BIGINT key domain") {
    // the naive (key * 2654435761) % 2^32 overflows ANSI BIGINT for
    // keys > ~3.47e9 — magnitudes a 100 TB orders table reaches (found
    // by the round-11 ScaleProbe sweep at 8×). The shipped split-
    // multiply spelling must (a) equal the mathematical product hash
    // for every key and (b) never throw. Probe the corners and a
    // spread of magnitudes including > 2^32 and Long.MaxValue.
    import spark.implicits._
    val keys = Seq(0L, 1L, 6000000L, 3470000000L, 4294967296L,
      (1L << 40) + 12345L, (1L << 62) + 7L, Long.MaxValue)
    val hashed = keys.toDF("o_orderkey")
      .selectExpr("o_orderkey", s"${Multiset.hashExpr} AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      val expect = ((BigInt(k) % BigInt(2).pow(32)) * BigInt(2654435761L)) % BigInt(2).pow(32)
      withClue(s"key $k: ") { BigInt(hashed(k)) shouldBe expect }
    }
  }

  test("q_approx_distinct_audit: HLL estimate within the configured rsd envelope") {
    val rows = run("q_approx_distinct_audit").collect()
    rows should not be empty
    rows.foreach { r =>
      // rsd=0.02 → relative error beyond 5σ would be a sketch bug
      withClue(s"flag=${r.getString(0)} err=${r.getAs[Double]("rel_err")}") {
        r.getAs[Double]("rel_err") should be < 0.10
      }
    }
  }

  test("q_lateral_topn matches the window-rank formulation") {
    val expected = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("r_name").orderBy(col("n_custs").desc, col("n_name"))
      spark.read.parquet(s"$sfDir/region.parquet")
        .join(spark.read.parquet(s"$sfDir/nation.parquet"),
          col("r_regionkey") === col("n_regionkey"))
        .join(spark.read.parquet(s"$sfDir/customer.parquet"),
          col("n_nationkey") === col("c_nationkey"))
        .groupBy("r_name", "n_name").agg(count(lit(1)).as("n_custs"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("r_name", "n_name", "n_custs")
    }
    val got = run("q_lateral_topn")
    got.except(expected).count() shouldBe 0
    expected.except(got).count() shouldBe 0
  }

  test("q_null_safe_join keeps the NULL-key group a plain equi-join drops") {
    val rows = run("q_null_safe_join").collect()
    rows.count(_.isNullAt(0)) shouldBe 1 // the nulled '5-LOW' bucket survives
    rows.length shouldBe 5
  }

  test("q_stratified_sample is deterministic across runs") {
    val a = run("q_stratified_sample").collect().toSeq
    val b = run("q_stratified_sample").collect().toSeq
    a shouldBe b
  }
}
