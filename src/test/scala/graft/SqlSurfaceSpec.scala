package graft

import org.apache.spark.sql.functions._

/** The SQL-text surface: after T.registerViews, every driver table and
  * the custom graft functions are reachable from `spark.sql(...)` — the
  * consumption path for notebook/BI users who never touch the Column
  * API. */
class SqlSurfaceSpec extends SparkSpec {

  test("registered views + functions answer SQL text, matching the DataFrame path") {
    T.registerViews(spark, sfDir)

    // a join + decimal-exact aggregate in pure SQL text
    val viaSql = spark.sql("""
      SELECT n_name, count(*) AS n_customers,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""").collect()
    val viaDf = T(spark, sfDir, "customer")
      .join(broadcast(T(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("n_name").collect()
    viaSql.map(_.toString).toSeq shouldBe viaDf.map(_.toString).toSeq

    // the custom codegen'd expression resolves from SQL by name
    val n2 = spark.sql("""
      SELECT vec_dot(transform(embedding, x -> CAST(x AS DOUBLE)),
                     transform(embedding, x -> CAST(x AS DOUBLE))) AS n2
      FROM embeddings WHERE vec_id = 0""").head().getDouble(0)
    n2 shouldBe 1.0 +- 1e-3 // testdata embeddings are unit-normalized

    // the custom generator (UDTF) resolves from SQL by name
    val ngrams = spark.sql("""
      SELECT g.pos, g.ngram
      FROM (SELECT split('a b c d', ' ') AS t)
      LATERAL VIEW word_ngrams(t, 2) g AS pos, ngram
      ORDER BY g.pos""").collect()
    ngrams.map(r => (r.getInt(0), r.getString(1))).toSeq shouldBe
      Seq((0, "a b"), (1, "b c"), (2, "c d"))
  }
}
