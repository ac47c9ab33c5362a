package graft.functions

import graft.SparkSpec

/** SQL-text access to the custom expressions after registration. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered functions are callable from SQL") {
    GraftFunctions.register(spark)
    spark.sql("SELECT vec_dot(array(1D, 2D), array(3D, 4D)) AS d")
      .as[Double].head() shouldBe 11.0
    spark.sql("SELECT simhash64(array('slow', 'big')) AS h")
      .as[Long].head() should not be 0L
    spark.sql("SELECT size(lsh_buckets_8x4(array_repeat(0.5D, 64))) AS n")
      .as[Int].head() shouldBe 8
    spark.sql("SELECT size(rolling_hashes16('abcdefghijklmnopqr')) AS n")
      .as[Int].head() shouldBe 3 // 18 chars -> 3 windows of 16
  }

  test("vec_dot rejects mixed float/double inputs at analysis time") {
    GraftFunctions.register(spark)
    // both eval paths read BOTH sides with one accessor keyed off the
    // left type — a mixed call must fail analysis, not silently read
    // double-backed ArrayData as floats
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT vec_dot(CAST(array(1.0, 2.0) AS array<float>), array(3D, 4D))")
        .collect()
    }
    e.getMessage should include("vec_dot")
    // same-typed float arrays stay accepted (the optimizer-rule shape)
    spark.sql(
      """SELECT vec_dot(CAST(array(1.0, 2.0) AS array<float>),
        |               CAST(array(3.0, 4.0) AS array<float>)) AS d""".stripMargin)
      .as[Double].head() shouldBe 11.0
  }

  test("SQL results agree with the Column API") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash64(array('slow', 'big', 'dup')) AS h")
      .as[Long].head()
    val viaCol = Seq(Seq("slow", "big", "dup")).toDF("t")
      .select(TextFunctions.simhash64($"t")).as[Long].head()
    viaSql shouldBe viaCol
  }
}
