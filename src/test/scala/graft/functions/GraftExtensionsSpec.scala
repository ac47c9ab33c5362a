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

  test("word_ngrams generator: streams the same rows as the HOF formulation") {
    import org.apache.spark.sql.functions.{expr, posexplode, split}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", split($"text", " ", -1).as("t"))
    val viaGen = docs
      .select($"doc_id", WordNgrams.wordNgrams($"t", 8).as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaHof = docs
      .filter(org.apache.spark.sql.functions.size($"t") >= 8)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, size(t) - 8), i -> concat_ws(' ', slice(t, i + 1, 8)))"))
        .as(Seq("pos", "ngram")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    viaGen shouldBe viaHof
    viaGen.size should be > 0
  }

  test("word_ngrams: SQL lateral view, short-input emptiness, literal-arity guard") {
    GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT pos, ngram
        |FROM VALUES (array('a','b','c','d')) AS v(t)
        |LATERAL VIEW word_ngrams(t, 3) g AS pos, ngram""".stripMargin)
      .as[(Int, String)].collect()
    rows shouldBe Array((0, "a b c"), (1, "b c d"))
    // shorter than n -> zero rows, not null rows
    spark.sql(
      """SELECT pos FROM VALUES (array('a','b')) AS v(t)
        |LATERAL VIEW word_ngrams(t, 3) g AS pos, ngram""".stripMargin)
      .count() shouldBe 0L
    // non-literal n is rejected with a named error
    val e = intercept[Exception] {
      spark.sql(
        """SELECT pos FROM VALUES (array('a'), 2) AS v(t, k)
          |LATERAL VIEW word_ngrams(t, k) g AS pos, ngram""".stripMargin).collect()
    }
    e.getMessage should include("word_ngrams")
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
