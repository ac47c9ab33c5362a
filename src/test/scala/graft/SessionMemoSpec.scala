package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The cache-ownership contract the whole engine leans on: one
  * materialized copy per (session, dir, key), released by clear(), and
  * no pinned orphans when a build job fails. */
class SessionMemoSpec extends SparkSpec {

  test("materialized pins once, shares on re-access, and clear() releases") {
    val dir = "/spec/memo/probe"
    var builds = 0
    def get(): DataFrame = SessionMemo.materialized(spark, dir, "probe") {
      builds += 1
      spark.range(10).toDF("n")
    }
    val first = get()
    first.storageLevel should not be StorageLevel.NONE
    val second = get()
    second should be theSameInstanceAs first // memo hit, no rebuild
    builds shouldBe 1
    SessionMemo.clear(spark)
    first.storageLevel shouldBe StorageLevel.NONE // released
    get().storageLevel should not be StorageLevel.NONE // rebuilds after clear
    builds shouldBe 2
    SessionMemo.clear(spark)
  }

  test("a failed materialization leaves nothing pinned and nothing registered") {
    val dir = "/spec/memo/boom"
    var captured: DataFrame = null
    an[Exception] should be thrownBy {
      SessionMemo.materialized(spark, dir, "boom") {
        captured = spark.range(5).select(expr("raise_error('boom')").as("x"))
        captured
      }
    }
    // the failure-path unpersist ran: the frame is not cache-pinned...
    captured.storageLevel shouldBe StorageLevel.NONE
    // ...and the key was never registered, so a later (working) build runs
    val ok = SessionMemo.materialized(spark, dir, "boom") { spark.range(3).toDF("n") }
    ok.count() shouldBe 3
    SessionMemo.clear(spark)
  }
}
