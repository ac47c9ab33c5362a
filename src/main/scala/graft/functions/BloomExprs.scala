package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a pre-built [[BloomFilter]] — the
  * build-side sketch travels INSIDE the plan (serialized with the
  * expression, like the PQ codebook literals), so the probe runs as a
  * plain whole-stage-codegen filter with no broadcast variable and no
  * UDF in the hot path.
  *
  * Byte contract: the probe hashes the UTF-8 bytes of the child string
  * (`UTF8String.getBytes`), so the filter MUST have been populated with
  * `putBinary(<utf8 bytes>)` of the same values — [[graft.llmops.LlmOps]]
  * builds it exactly that way rather than relying on `putString`'s
  * internal encoding choice. A false positive is possible BY DESIGN
  * (callers re-verify with an exact join); a false negative is not.
  */
final case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExprs {
  def bloomMightContain(c: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(BloomMightContain(GraftColumnBridge.expression(c), bloom))
}
