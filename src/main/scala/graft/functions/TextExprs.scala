package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Engine-neutral 64-bit token hash: the first 8 md5 digest bytes as a
  * big-endian two's-complement long — exactly what
  * `CAST('0x'||substr(md5(tok),1,8)...)` chunk assembly reproduces in
  * ANSI SQL, which is what lets the SimHash pipeline be oracle-paired.
  * MessageDigest instances are thread-local (they are stateful and NOT
  * thread-safe; one per executor thread, reset per call). */
object TextHash {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Long64(s: UTF8String): Long = {
    val d = tl.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(bytes, 0, 8).getLong
  }
}

/** SimHash64 over a token array in one codegen'd pass.
  *
  * Replaces the explode -> groupBy(doc, tok) -> 64-column conditional
  * aggregation formulation (a wide two-shuffle aggregate: ~64 x tokens
  * agg updates per doc). Per token occurrence each bit accumulates ±1 by
  * the bit of the token's [[TextHash.md5Long64]] hash — md5-derived
  * since round 8 so DuckDB computes the identical signature and the
  * pair query is oracle-paired (xxhash64 was Spark-only); the signature
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
        val h = TextHash.md5Long64(s)
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

  // freshName'd locals: raw names collide when two expressions fuse into
  // one codegen function (Janino redefinition error → interpreted fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val counts = ctx.freshName("counts")
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val h = ctx.freshName("h")
    val i = ctx.freshName("i")
    val sig = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, a => s"""
      |int[] $counts = new int[64];
      |int $n = $a.numElements();
      |for (int $j = 0; $j < $n; $j++) {
      |  if (!$a.isNullAt($j)) {
      |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
      |    long $h = graft.functions.TextHash.md5Long64($s);
      |    for (int $i = 0; $i < 64; $i++) {
      |      $counts[$i] += ((($h >>> $i) & 1L) == 1L) ? 1 : -1;
      |    }
      |  }
      |}
      |long $sig = 0L;
      |for (int $i = 0; $i < 64; $i++) { if ($counts[$i] > 0) $sig |= (1L << $i); }
      |${ev.value} = $sig;
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Polynomial rolling hashes of every `window`-char substring: one O(n)
  * pass using the rolling recurrence h' = ((h - c_out·B^(w-1))·B + c_in)
  * mod M — the HOF formulation recomputes each window from scratch with
  * an O(pos) substring seek, i.e. O(n·w) interpreted steps (measured
  * 57s at sf0.1; this expression: <1s). Character values are Unicode
  * code points (= DuckDB's ord()); hash values are identical to the
  * window-by-window fold since the recurrence is exact mod M. Returns
  * array<long>, empty for strings shorter than the window. */
final case class RollingHashes(child: Expression, window: Int, base: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  // B^(window-1) mod M, the coefficient of the outgoing character
  private lazy val pow: Long = {
    var p = 1L
    var i = 0
    while (i < window - 1) { p = p * base % mod; i += 1 }
    p
  }

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * base + cps(i)) % mod; i += 1 }
    out(0) = h
    i = window
    while (i < n) {
      h = ((h - cps(i - window) * pow % mod + mod) % mod * base + cps(i)) % mod
      out(i - window + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cps = ctx.freshName("cps")
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val h = ctx.freshName("h")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, a => s"""
      |int[] $cps = $a.toString().codePoints().toArray();
      |int $n = $cps.length;
      |long[] $out;
      |if ($n < $window) {
      |  $out = new long[0];
      |} else {
      |  $out = new long[$n - $window + 1];
      |  long $h = 0L;
      |  for (int $i = 0; $i < $window; $i++) { $h = ($h * $base + $cps[$i]) % $mod; }
      |  $out[0] = $h;
      |  for (int $i = $window; $i < $n; $i++) {
      |    $h = (($h - $cps[$i - $window] * ${pow}L % $mod + $mod) % $mod * $base + $cps[$i]) % $mod;
      |    $out[$i - $window + 1] = $h;
      |  }
      |}
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode White_Space strip (the reference's Python `.strip()`
  * semantics — see [[graft.T.wsClass]] for the codepoint set and the
  * cross-engine rationale) as one codegen'd two-pointer scan. The
  * regexp_replace spelling is semantically identical but costs a
  * regex-NFA walk per row — measured +2.6s on the sf0.1 flagged-report
  * query alone when it briefly shipped that way (round 11); this
  * expression restores the trim-era cost. The oracle keeps the RE2
  * spelling ([[graft.T.sqlUstrip]]): correctness-only, never hot.
  * Every White_Space codepoint is BMP (no surrogates), so a char-level
  * scan is codepoint-correct. */
object UStripImpl {
  def isWs(c: Char): Boolean =
    (c >= 0x09 && c <= 0x0D) || c == 0x20 || c == 0x85 || c == 0xA0 ||
      c == 0x1680 || (c >= 0x2000 && c <= 0x200A) ||
      c == 0x2028 || c == 0x2029 || c == 0x202F || c == 0x205F || c == 0x3000
  def strip(s: UTF8String): UTF8String = {
    val str = s.toString
    var i = 0
    var j = str.length
    while (i < j && isWs(str.charAt(i))) i += 1
    while (j > i && isWs(str.charAt(j - 1))) j -= 1
    if (i == 0 && j == str.length) s else UTF8String.fromString(str.substring(i, j))
  }
}

final case class UStrip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "ustrip"

  override protected def nullSafeEval(v: Any): Any =
    UStripImpl.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.UStripImpl.strip($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  /** 64-bit SimHash of an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  /** Unicode White_Space strip ([[UStrip]]). */
  def ustrip(c: Column): Column =
    GraftColumnBridge.column(UStrip(GraftColumnBridge.expression(c)))

  /** Rolling polynomial hashes of every `window`-char substring. */
  def rollingHashes(text: Column, window: Int, base: Long, mod: Long): Column =
    GraftColumnBridge.column(RollingHashes(
      GraftColumnBridge.expression(text), window, base, mod))
}
