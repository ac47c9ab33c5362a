package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, carry values from the LATEST
  * right row with the same key and right.ts <= left.ts (ties included).
  *
  * Spark has no built-in as-of join; the naive formulations are a range
  * join (O(n·m) BroadcastNestedLoop or a per-key explode) or a
  * groupBy-collect — both scale-killers. This is the single-shuffle
  * formulation: union both sides tagged, one window partitioned by key
  * ordered by (ts, side, tiebreak), and `last(payload, ignoreNulls)` over
  * the running frame fills each left row with the most recent right
  * payload. Cost = one shuffle on the key + one sort per partition,
  * identical to the sort-merge join the key would need anyway; per-key
  * state during the window scan is O(1). Right rows sort BEFORE left rows
  * at equal ts, so a right row exactly at left.ts matches (ASOF >=
  * semantics, like DuckDB/pandas merge_asof).
  */
object AsOfJoin {

  /** @param payload  right-side columns carried onto left rows (nulled
    *                 until the first right row per key)
    * @param tiebreak deterministic order within equal (ts, side) — e.g. an
    *                 event id; required for reproducible results when one
    *                 side can repeat a timestamp within a key
    */
  def backward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      payload: Seq[String]): DataFrame = {
    val shared = Seq(key, ts, tiebreak)
    val l = left.select(shared.map(col) ++
      Seq(lit(1).as("__side")) ++
      payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
      left.columns.filterNot(shared.contains).map(col): _*)
    val r = right.select(shared.map(col) ++
      Seq(lit(0).as("__side")) ++
      payload.map(c => col(c).as(s"__r_$c")) ++
      left.columns.filterNot(shared.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val renames = payload.map(c => col(s"__r_$c").as(c))
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ renames: _*)
  }
}
