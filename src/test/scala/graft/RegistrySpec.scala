package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract hygiene: the properties the driver harness silently depends
  * on. A duplicate name would shadow a query in SparkEntry.queries; an
  * unknown table in oracle SQL would fail only at DuckDB time. */
class RegistrySpec extends AnyFunSuite with Matchers {

  test("query names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    names.distinct.size shouldBe names.size
    names.foreach(n => n should fullyMatch regex "[a-z0-9_]+")
  }

  test("every query has documentation") {
    Registry.all.foreach(q => withClue(q.name) { q.doc should not be empty })
  }

  test("oracle SQL references only driver-provided tables") {
    val known = T.tableNames.toSet
    // word-boundary FROM/JOIN targets; CTE names are declared inside the SQL
    val fromJoin = "(?i)\\b(?:FROM|JOIN)\\s+([a-zA-Z_][a-zA-Z0-9_]*)".r
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (name, rawSql) =>
      // EXTRACT(field FROM col) is not a table reference
      val sql = rawSql.replaceAll("(?i)extract\\s*\\([^)]*\\)", "")
      val ctes = "(?i)\\b([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([a-zA-Z0-9_,\\s]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      fromJoin.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(ctes).filterNot(Set("unnest", "generate_series", "read_parquet"))
        .foreach { t =>
          withClue(s"$name references table '$t': ") { known should contain(t) }
        }
    }
  }

  test("SparkEntry derives the full registry") {
    SparkEntry.queries.keySet shouldBe Registry.all.map(_.name).toSet
    SparkEntry.oracleSql.keySet shouldBe
      Registry.all.filter(_.oracle.isDefined).map(_.name).toSet
  }
}
