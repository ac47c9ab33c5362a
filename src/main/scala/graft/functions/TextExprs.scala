package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash64 over a token array in one codegen'd pass.
  *
  * Replaces the explode -> groupBy(doc, tok) -> 64-column conditional
  * aggregation formulation (a wide two-shuffle aggregate: ~64 x tokens
  * agg updates per doc). Per token occurrence each bit accumulates ±1 by
  * the bit of xxhash64(token, seed 42 — Spark's xxhash64() default, so
  * signatures match the composable formulation exactly); the signature
  * sets bit i iff the accumulated sum is positive. Summing ±1 per
  * OCCURRENCE equals the ±tf-per-distinct-token form. Null tokens are
  * skipped (whitespace split never produces them).
  */
final case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var i = 0
        while (i < 64) {
          counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |int[] counts = new int[64];
      |int n = $a.numElements();
      |for (int j = 0; j < n; j++) {
      |  if (!$a.isNullAt(j)) {
      |    org.apache.spark.unsafe.types.UTF8String s = $a.getUTF8String(j);
      |    long h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      |      s.getBaseObject(), s.getBaseOffset(), s.numBytes(), 42L);
      |    for (int i = 0; i < 64; i++) {
      |      counts[i] += (((h >>> i) & 1L) == 1L) ? 1 : -1;
      |    }
      |  }
      |}
      |long sig = 0L;
      |for (int i = 0; i < 64; i++) { if (counts[i] > 0) sig |= (1L << i); }
      |${ev.value} = sig;
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
}
