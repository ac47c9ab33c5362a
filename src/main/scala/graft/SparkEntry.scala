package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Everything is derived from [[Registry.all]]: one GraftQuery per
  * implemented operator, with paired DuckDB oracle SQL where the
  * semantics are SQL-expressible. */
object SparkEntry {
  /** Flagship (SURVEY.md §7.2): A1 "Issue Distribution" over the full
    * annotate -> flatten pipeline — source, enrichment, explode, union,
    * aggregate, and sort in one query. Driver smoke-checks rows > 0 on
    * sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("parity_a1_issue_distribution")
      .run(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate LSH variants) — driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
  /** The static oracles plus the data-dependent GENERATED ones (SQL
    * embedding deterministic per-dir constants — see
    * [[GraftQuery.oracleGen]]); Verify dumps this merged map so the
    * driver's DuckDB compare covers both kinds. */
  def oracleSqlFor(spark: SparkSession, sfDir: String): Map[String, String] =
    Registry.all.flatMap(q =>
      q.oracle.orElse(q.oracleGen.map(_(spark, sfDir))).map(q.name -> _)).toMap
}
