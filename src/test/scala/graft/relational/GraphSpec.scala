package graft.relational

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** PageRank semantics: the distributed iteration must agree with a
  * driver-side reference implementation that mirrors the exact-decimal
  * contribution discipline, and the co-supply graph must be symmetric. */
class GraphSpec extends SparkSpec {

  private def edges(): Seq[(Long, Long)] = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"))
    li.toDF("o", "src").join(li.toDF("o", "dst"), "o")
      .where(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("co-supply edge list is symmetric and irreflexive") {
    val es = edges().toSet
    es.foreach { case (a, b) =>
      a should not be b
      es should contain((b, a))
    }
  }

  test("q_pagerank_cosupply matches a driver-side exact-decimal reference") {
    val es = edges()
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank: Map[Long, Double] = outdeg.keys.map(_ -> 1.0).toMap
    for (_ <- 1 to 3) {
      // mirror the query: per-edge contribution rank/outdeg * 1e12
      // TRUNCATED to an integer (tie-free), summed exactly, then one
      // double step
      val in = es.groupBy(_._2).map { case (dst, inEdges) =>
        val sum = inEdges
          .map { case (src, _) => BigInt((rank(src) / outdeg(src) * 1e12).toLong) }
          .sum
        dst -> (0.15 + 0.85 * (sum.toDouble / 1e12))
      }
      rank = in
    }
    val got = Registry.byName("q_pagerank_cosupply").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe rank.keySet
    got.foreach { case (node, r) => r shouldBe rank(node) +- 1e-12 }
  }

  test("ranks stay positive and total mass is bounded by node count") {
    val rows = Registry.byName("q_pagerank_cosupply").run(spark, sfDir).collect()
    rows.foreach(_.getDouble(1) should be > 0.15)
    // with no dangling mass the total is exactly preserved at |V|
    rows.map(_.getDouble(1)).sum shouldBe rows.length.toDouble +- 1e-6
  }
}
