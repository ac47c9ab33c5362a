package graft.events

import graft.{GraftQuery, T}
import org.apache.spark.sql.functions._

/** Skew-mitigated SHUFFLE JOIN (E5, §2.3 continued) — the join-side twin
  * of `e5_hourly_salted_agg`. `event_type` has ~5 distinct values: a
  * plain shuffled join on it lands each type on ONE reducer, so at 1000
  * executors 995 sit idle while 5 process 20 TB each. Salting spreads
  * every type over S reducers: the fact side gets a deterministic
  * `salt = hash(event_id) % S`, the dim side is exploded ×S (one copy
  * per salt value), and the join key becomes (event_type, salt) — same
  * rows out, S× the parallelism.
  *
  * At THIS dim size broadcast is obviously the right plan (and the spec
  * cross-checks against exactly that); the salted query pins a
  * shuffle-hash join to exercise the pattern that applies when the dim
  * is itself too big to broadcast (per-(type, tenant) config tables run
  * to 10⁸ rows) but the join key alone is low-cardinality.
  */
object Skew {

  import EventAnalytics.events

  private val salts = 8

  /** type→weight dim, inline VALUES so the oracle is closed-form. */
  private val dimRows = Seq(
    ("click", 1.0), ("view", 0.5), ("purchase", 10.0),
    ("signup", 5.0), ("error", 0.0))

  private val saltedJoin = GraftQuery(
    "e5_skew_salted_join",
    "salted shuffle join on a 5-value key, identical result to the direct join (E5 §2.3)",
    Some(s"""
      WITH dim AS (
        SELECT * FROM (VALUES ${dimRows.map { case (t, w) => s"('$t', CAST($w AS DOUBLE))" }.mkString(", ")})
          AS t(event_type, weight))
      SELECT e.event_type, COUNT(*) AS n_events,
             ${T.sqlDsum("e.value")} * MIN(d.weight) AS weighted_value
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY e.event_type ORDER BY e.event_type"""),
    (s, dir) => {
      import s.implicits._
      val dim = dimRows.toDF("event_type", "weight")
        // one dim copy per salt value: dim grows ×S, every (type, salt)
        // reducer finds its match locally
        .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
      val fact = events(s, dir)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salts)))
      fact.as("e")
        .join(dim.hint("shuffle_hash").as("d"), Seq("event_type", "salt"))
        .groupBy(col("event_type"))
        // weight is functionally dependent on the group key; MIN picks the
        // single value without widening the group-by (same in the oracle)
        .agg(
          count(lit(1)).as("n_events"),
          (T.dsum(col("e.value")) * min(col("d.weight"))).as("weighted_value"))
        .orderBy(col("event_type"))
    })

  def queries: Seq[GraftQuery] = Seq(saltedJoin)
}
