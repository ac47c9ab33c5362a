package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored item flowing into [[TopKAgg]]: `score` ranks (descending),
  * `id` breaks ties (ascending) so the top-k set is total-order
  * deterministic even with duplicate scores.
  */
final case class Scored(score: Double, id: Long)

/** Bounded top-k-per-group as a typed `Aggregator` (the UDAF surface,
  * SURVEY §2.12): each aggregation buffer keeps AT MOST k items, sorted
  * best-first.
  *
  * Why this beats the window formulation at 100 TB: a
  * `row_number() OVER (PARTITION BY g ORDER BY score)` plan must shuffle
  * EVERY input row to its group's reducer and sort the whole group; this
  * aggregate is algebraic — `reduce` folds rows into a k-bounded buffer
  * map-side (partial aggregation), so the shuffle carries at most
  * k rows per group PER MAP PARTITION and the reducer merges k-bounded
  * buffers. For 600k rows → 25 groups × k=3, the shuffle payload drops
  * from 600k rows to ≤ 25×3×(#map partitions). No per-group sort ever
  * materializes the full group.
  *
  * `reduce` is O(1) for the common case (row worse than the current
  * k-th: one comparison, no allocation); only a top-k contender pays the
  * O(k) insertion.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  /** Total order: higher score first, then lower id. */
  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] =
    if (buf.length >= k && !beats(in, buf.last)) buf else insert(buf, in)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(reduce)

  private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] = {
    val (better, worse) = buf.partition(beats(_, v))
    (better :+ v) ++ worse.take(k - better.length - 1)
  }

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] = TopKAgg.seqEncoder
  override def outputEncoder: Encoder[Seq[Scored]] = TopKAgg.seqEncoder
}

object TopKAgg {
  /** Product-based encoder for the buffer/output (kryo would defeat
    * Tungsten's serialized aggregation buffers). */
  private[functions] val seqEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  val inputEncoder: Encoder[Scored] = Encoders.product[Scored]

  /** Untyped column form, usable in `df.groupBy(...).agg(...)` and —
    * after `spark.udf.register("topk_3", TopKAgg.udaf(3))` — from SQL. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), inputEncoder)
}
