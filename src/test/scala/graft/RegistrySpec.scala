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
      // EXTRACT(field FROM col) is not a table reference, and neither is
      // the FROM inside the null-safe-equality operator `a IS NOT
      // DISTINCT FROM b` (round-16 oracles use it in rejoins)
      val sql = rawSql.replaceAll("(?i)extract\\s*\\([^)]*\\)", "")
        .replaceAll("(?i)IS\\s+NOT\\s+DISTINCT\\s+FROM", "IS_NOT_DISTINCT_OP")
      // `AS MATERIALIZED (` / `AS NOT MATERIALIZED (` are valid DuckDB
      // CTE modifiers (the BPE oracle materializes its per-round CTEs to
      // stop 2^k inlined rescans) — the declaration regex must accept them
      // or the CTE name leaks into the unknown-table check (round-17 miss)
      val ctes = ("(?i)\\b([a-zA-Z_][a-zA-Z0-9_]*)\\s*(?:\\([a-zA-Z0-9_,\\s]*\\))?" +
        "\\s+AS\\s*(?:(?:NOT\\s+)?MATERIALIZED\\s*)?\\(").r
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

/** Contract-schema hygiene (needs a session: schemas come from the built
  * plans). The driver's hash compare is sensitive to the PHYSICAL numeric
  * representation, not just the value: a decimal wider than 18 digits
  * exceeds int64, and DuckDB's HUGEINT/wide-DECIMAL then hashes
  * differently from Spark's Decimal even when every digit matches (the
  * round-7 `q_table_fingerprint` failure). Oracle-paired queries must
  * therefore keep numeric outputs within 64 bits — render anything wider
  * as a string on both sides. */
class RegistrySchemaSpec extends SparkSpec {
  test("no oracle-paired query emits a >18-digit decimal anywhere in its schema") {
    import org.apache.spark.sql.types._
    def wideDecimals(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 =>
        Seq(s"$path: DECIMAL(${d.precision},${d.scale})")
      case s: StructType =>
        s.fields.toSeq.flatMap(f => wideDecimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => wideDecimals(a.elementType, s"$path[]")
      case m: MapType =>
        wideDecimals(m.keyType, s"$path.key") ++
          wideDecimals(m.valueType, s"$path.value")
      case _ => Seq.empty
    }
    Registry.all.filter(_.oracle.isDefined).foreach { q =>
      val offenders = q.run(spark, sfDir).schema.fields.toSeq
        .flatMap(f => wideDecimals(f.dataType, f.name))
      withClue(s"${q.name} emits wide decimals the driver hasher cannot " +
        s"normalize across engines — render as string instead: ") {
        offenders shouldBe empty
      }
    }
  }
}
