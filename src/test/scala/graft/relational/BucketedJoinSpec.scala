package graft.relational

import graft.{Registry, SparkSpec, T}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evidence for the §2.3 bucketed-join layout: both fact tables
  * bucketed+sorted on the join key with matching bucket counts must
  * produce a sort-merge join with NO exchange on either side, where the
  * identical join over raw parquet shuffles both. hint("merge") pins
  * the strategy so AQE's broadcast choice at tiny SF can't mask the
  * comparison. */
class BucketedJoinSpec extends SparkSpec {

  private def nExchanges(df: DataFrame): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed orderkey join is exchange-free where the raw-parquet twin shuffles both sides") {
    val (ot, lt) = Relational.bucketedOrderTables(spark, sfDir)
    val bucketed = spark.table(ot).hint("merge")
      .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber"))
    val raw = T(spark, sfDir, "orders").hint("merge")
      .join(T(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber"))
    nExchanges(bucketed) shouldBe 0 // co-located buckets: zero shuffles
    nExchanges(raw) shouldBe 2 // the naive join exchanges both facts
    // and the layout changes nothing semantically
    bucketed.count() shouldBe raw.count()
  }

  test("q_bucketed_join matches the same query over raw parquet") {
    import spark.implicits._
    val viaBuckets = Registry.byName("q_bucketed_join").run(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val viaRaw = T(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= expr("timestamp'1995-01-01 00:00:00'") &&
        col("o_orderdate") < expr("timestamp'1996-01-01 00:00:00'"))
      .join(T(spark, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        T.dsum(col("l_quantity")).as("total_qty"))
      .orderBy("o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    viaBuckets shouldBe viaRaw
  }

  test("dropBucketedTables drops the catalog entries and deletes the tmpdir data") {
    val (ot, lt) = Relational.bucketedOrderTables(spark, sfDir)
    val paths = Seq(ot, lt).map(n =>
      new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_bucketed_$n"))
    paths.foreach(_.exists() shouldBe true)
    Relational.dropBucketedTables(spark)
    spark.catalog.tableExists(ot) shouldBe false
    spark.catalog.tableExists(lt) shouldBe false
    paths.foreach(_.exists() shouldBe false)
    // recreate on demand still works after a drop (idempotent lifecycle)
    val (ot2, _) = Relational.bucketedOrderTables(spark, sfDir)
    spark.catalog.tableExists(ot2) shouldBe true
  }
}
