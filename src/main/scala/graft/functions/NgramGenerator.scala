package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(tokens, n)` — a custom Catalyst `Generator` (the UDTF
  * extension class, SURVEY §2.12): one row per n-token window of the
  * input array, emitting `(pos, ngram)` with pos 0-based.
  *
  * Why a Generator and not the composable
  * `explode(transform(sequence(...), i -> concat_ws(slice(...))))`
  * formulation the span queries use: the HOF chain materializes the
  * full n-gram ARRAY per row before exploding — for a 10k-token
  * document at n=8 that is an ~80k-cell transient array per row held in
  * the projection. The generator streams windows lazily, one at a time,
  * so per-row transient memory is O(n tokens) — one window's string —
  * not O(tokens × n). Same rows, same downstream plan (Generate
  * feeds whole-stage codegen consumers), lower peak memory on the long
  * tail of documents — the rows that actually hurt at 100 TB.
  *
  * Non-goals kept honest: `eval` is CodegenFallback (generators are not
  * whole-stage-codegen'd by Spark anyway — Generate is its own operator);
  * null/short inputs produce zero rows (matching the HOF formulation's
  * empty sequence), and null tokens render as empty strings exactly like
  * `concat_ws`.
  */
final case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "word_ngrams"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams: n must be >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val last = arr.numElements() - n
      if (last < 0) Iterator.empty
      else (0 to last).iterator.map { i =>
        // concat_ws semantics exactly: a null token contributes NOTHING
        // — neither value nor separator — so the generator stays
        // fingerprint-identical to the HOF concat_ws formulation on
        // null-bearing arrays (rendering null as "" would leave a
        // doubled separator concat_ws never emits)
        val sb = new java.lang.StringBuilder
        var j = 0
        var wrote = false
        while (j < n) {
          if (!arr.isNullAt(i + j)) {
            if (wrote) sb.append(' ')
            sb.append(arr.getUTF8String(i + j).toString)
            wrote = true
          }
          j += 1
        }
        InternalRow(i, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  /** Column-API entry: alias the two generated columns with
    * `.as(Seq("pos", "ngram"))` like posexplode. */
  def wordNgrams(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(tokens), n))
}
