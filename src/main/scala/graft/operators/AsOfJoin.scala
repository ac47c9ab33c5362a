package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for each left row, carry values from the LATEST
  * right row with the same key and right.ts <= left.ts (ties included).
  *
  * Spark has no built-in as-of join; the naive formulations are a range
  * join (O(n·m) BroadcastNestedLoop or a per-key explode) or a
  * groupBy-collect — both scale-killers. This is the single-shuffle
  * formulation: union both sides tagged, one window partitioned by key
  * ordered by (ts, side, tiebreak), and `last(payload-struct,
  * ignoreNulls)` over the running frame fills each left row with the
  * most recent right payload. Cost = one shuffle on the key + one sort
  * per partition, identical to the sort-merge join the key would need
  * anyway; per-key state during the window scan is O(1). Right rows sort
  * BEFORE left rows at equal ts, so a right row exactly at left.ts
  * matches (ASOF >= semantics, like DuckDB/pandas merge_asof).
  *
  * Row atomicity: the payload columns are carried as ONE struct — the
  * struct is non-null on every right row even when individual payload
  * FIELDS are null, so all carried values always come from the same
  * matched right row. (Per-column `last(ignoreNulls)` fills would
  * instead pull each null field from an older right row, tearing the
  * output across source rows — and would cost one window pass per
  * payload column besides.)
  */
object AsOfJoin {

  /** Null literal typed as the struct of `fields` drawn from `src`'s
    * schema — the left-side placeholder for the carried right payload. */
  private def nullStruct(src: DataFrame, fields: Seq[String]): Column =
    lit(null).cast(StructType(fields.map(src.schema.apply)))

  /** @param payload  right-side columns carried onto left rows (nulled
    *                 until the first right row per key); individual
    *                 payload values MAY be null — the whole matched row
    *                 is carried atomically
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
      Seq(lit(1).as("__side"), nullStruct(right, payload).as("__r")) ++
      left.columns.filterNot(shared.contains).map(col): _*)
    val r = right.select(shared.map(col) ++
      Seq(lit(0).as("__side"), struct(payload.map(col): _*).as("__r")) ++
      left.columns.filterNot(shared.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    val picked = payload.map(c => col("__r").getField(c).as(c))
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ picked: _*)
  }

  /** Forward as-of join — for each left row, carry values from the
    * EARLIEST right row with the same key and right.ts >= left.ts (ties
    * included): [[backward]] mirrored. Right rows sort AFTER left rows at
    * equal ts (side 0 vs 1 flipped relative to backward) so an
    * equal-timestamp right row is inside the forward frame, and the
    * mirrored `first(payload-struct, ignoreNulls)` over
    * (currentRow, unboundedFollowing) fills each left row with the next
    * right payload. Same single-shuffle cost as backward; at equal
    * (ts, side) the SMALLEST tiebreak wins (the first row in order).
    */
  def forward(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      payload: Seq[String]): DataFrame = {
    val shared = Seq(key, ts, tiebreak)
    val l = left.select(shared.map(col) ++
      Seq(lit(0).as("__side"), nullStruct(right, payload).as("__r")) ++
      left.columns.filterNot(shared.contains).map(col): _*)
    val r = right.select(shared.map(col) ++
      Seq(lit(1).as("__side"), struct(payload.map(col): _*).as("__r")) ++
      left.columns.filterNot(shared.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col(tiebreak))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = l.unionByName(r)
      .withColumn("__r", first(col("__r"), ignoreNulls = true).over(w))
    val picked = payload.map(c => col("__r").getField(c).as(c))
    filled.filter(col("__side") === 0)
      .select(left.columns.map(col) ++ picked: _*)
  }

  /** Nearest as-of join — for each left row, the right row with the same
    * key minimizing |right.ts - left.ts|, either direction (pandas
    * merge_asof direction='nearest'). Unmatched left rows keep null
    * payload.
    *
    * Same single-shuffle shape as [[backward]]: ONE union, ONE window
    * sort per key partition, and TWO frames over that one sort — the
    * running `last` fills the backward candidate struct, the mirrored
    * `first` over (currentRow, unboundedFollowing) fills the forward
    * candidate struct; a final projection picks the closer. Spark plans
    * both frames over the same Sort+Exchange, so nearest costs exactly
    * one extra window pass over backward, never a second shuffle. Each
    * candidate is one struct of (ts, payload...), so the matched ts and
    * payload always come from the same right row even when payload
    * fields are null.
    *
    * Determinism contract (mirrored by oracles): ties at equal distance
    * prefer the BACKWARD candidate; within the backward side an equal-ts
    * tie takes the greatest tiebreak (the running `last`), within the
    * forward side the smallest (the mirrored `first`).
    */
  def nearest(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tiebreak: String,
      payload: Seq[String]): DataFrame = {
    val shared = Seq(key, ts, tiebreak)
    val rPay = ts +: payload // carry right ts to compute distances
    val l = left.select(shared.map(col) ++
      Seq(lit(1).as("__side"), nullStruct(right, rPay).as("__r")) ++
      left.columns.filterNot(shared.contains).map(col): _*)
    val r = right.select(shared.map(col) ++
      Seq(lit(0).as("__side"), struct(rPay.map(col): _*).as("__r")) ++
      left.columns.filterNot(shared.contains)
        .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val ord = Seq(col(ts), col("__side"), col(tiebreak))
    val back = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = l.unionByName(r)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(back))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(fwd))
    val bTs = col("__b").getField(ts)
    val fTs = col("__f").getField(ts)
    // backward wins when it exists and is at least as close; distances in
    // microseconds (a plain long cast floors to seconds and would merge
    // sub-second distinctions into false ties)
    val useBack = bTs.isNotNull &&
      (fTs.isNull ||
        unix_micros(col(ts)) - unix_micros(bTs) <=
          unix_micros(fTs) - unix_micros(col(ts)))
    val picked = payload.map(c =>
      when(useBack, col("__b").getField(c)).otherwise(col("__f").getField(c)).as(c)) :+
      when(useBack, bTs).otherwise(fTs).as(s"${ts}_matched")
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++ picked: _*)
  }
}
