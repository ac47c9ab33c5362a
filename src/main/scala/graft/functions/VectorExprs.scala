package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the embedding hot path.
  *
  * The composable formulation — `aggregate(zip_with(a, b, ...), ...)` —
  * is semantically right but interpreted per element: ~450 ns/element of
  * lambda dispatch, measured 5.6 s for 2000×96 64-dim dot products at
  * sf0.1. These expressions generate tight Java loops inside whole-stage
  * codegen (preference order (b) of the build brief: a native Expression
  * with doGenCode beats a Scala UDF). Evaluation order is the same
  * sequential fold as the HOF form and DuckDB's list_reduce, so results
  * stay bit-identical to the oracles.
  */

/** dot(a, b) over array<double> OR array<float> columns; null if either
  * side is null, and null if any PAIRED ELEMENT is null — exactly the
  * analyzed-HOF semantics (`zip_with` yields a null product for a null
  * slot and `Add(acc, null)` poisons the fold) and DuckDB's
  * list_reduce. Matching the HOF here is load-bearing: the Catalyst
  * [[graft.plans.VectorizeRule]] rewrites the HOF spelling into this
  * expression, and a rewrite must never change results — reading null
  * slots as 0.0 (the pre-round-9 behavior) silently would have. Extra
  * elements of the longer array are ignored (callers pass equal-length
  * vectors).
  *
  * Float inputs keep the analyzed-HOF semantics exactly: the per-element
  * product is computed in FLOAT arithmetic (that's what
  * `zip_with(af, bf, (x, y) -> x * y)` does — Multiply over float binds
  * float) and only then widened to double for the accumulator (the
  * `Add(acc, Cast(el, double))` the analyzer inserts into the merge
  * lambda). A double-multiply of widened floats would be exact (24+24
  * mantissa bits fit in 53) and so bit-DIFFERENT from the HOF's
  * float-rounded product. */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  // the eval paths read BOTH sides with one accessor keyed off the left
  // type, so mixed float/double inputs must be an analysis error, not a
  // silent misread of double-backed ArrayData through getFloat (the
  // optimizer rule only ever builds same-typed pairs, but `vec_dot` is
  // also a registered SQL function any query can call directly)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) && rt == lt =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same element type " +
          s"(both array<float> or both array<double>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  private lazy val floatInputs = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Null SLOTS can only occur when a child's array type admits them —
    * the per-element check (and the result's nullability) keys off the
    * schema, so containsNull=false inputs keep the branch-free loop. */
  private lazy val elementsNullable = Seq(left.dataType, right.dataType).exists {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    if (elementsNullable) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        s += (if (floatInputs) (a.getFloat(i) * b.getFloat(i)).toDouble
              else a.getDouble(i) * b.getDouble(i))
        i += 1
      }
    } else if (floatInputs)
      while (i < n) { s += (a.getFloat(i) * b.getFloat(i)).toDouble; i += 1 }
    else
      while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  // every local is freshName'd: two expressions fused into one codegen
  // function would otherwise redeclare the same variable (Janino error →
  // whole-stage falls back to interpreted)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (n, s, i) = (ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("i"))
    // Java: float * float is computed in float then implicitly widened by
    // +=, matching the interpreted path above
    def prod(a: String, b: String) =
      if (floatInputs) s"$a.getFloat($i) * $b.getFloat($i)"
      else s"$a.getDouble($i) * $b.getDouble($i)"
    // the null-slot check compiles in ONLY for schemas that admit null
    // elements, so the containsNull=false hot path stays a branch-free
    // fused multiply loop
    def slotGuard(a: String, b: String) =
      if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |int $n = Math.min($a.numElements(), $b.numElements());
      |double $s = 0.0;
      |for (int $i = 0; $i < $n; $i++) {
      |  ${slotGuard(a, b)}
      |  $s += ${prod(a, b)};
      |}
      |${ev.value} = $s;
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multi-table sign-bit LSH buckets: for each of `tables` tables, the
  * bucket id whose bit b is sign(v · planes(t*bits + b)). Returns
  * array<int> of length `tables` — one pass over the vector data computes
  * every table's bucket, vs. tables×bits separate HOF dot expressions. */
final case class LshBuckets(child: Expression, planes: Array[Array[Double]],
    tables: Int, bits: Int)
    extends UnaryExpression {
  require(planes.length == tables * bits, s"need ${tables * bits} planes, got ${planes.length}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  /** Same discipline as [[DotProduct]]: a null SLOT poisons every
    * plane's dot (an HOF spelling would fold to null), so the whole
    * bucket array is null — never a silent read-as-0.0 that could hash
    * a vector into a sign-flipped bucket. Schema-keyed so
    * containsNull=false inputs keep the branch-free loop. */
  private lazy val elementsNullable = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def nullable: Boolean = child.nullable || elementsNullable

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (elementsNullable) {
      var i = 0
      val m = a.numElements()
      while (i < m) { if (a.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        val n = math.min(a.numElements(), p.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += a.getDouble(i) * p(i); i += 1 }
        if (s > 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val out = ctx.freshName("out")
    val t = ctx.freshName("t")
    val bucket = ctx.freshName("bucket")
    val b = ctx.freshName("b")
    val p = ctx.freshName("p")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val g = ctx.freshName("g")
    // null-slot pre-scan compiles in ONLY for schemas admitting null
    // elements (mirrors DotProduct's slotGuard)
    def slotGuard(a: String) =
      if (elementsNullable) s"""
        |for (int $g = 0; $g < $a.numElements(); $g++) {
        |  if ($a.isNullAt($g)) { ${ev.isNull} = true; break; }
        |}""".stripMargin
      else ""
    nullSafeCodeGen(ctx, ev, a => s"""
      |${slotGuard(a)}
      |if (!${ev.isNull}) {
      |  int[] $out = new int[$tables];
      |  for (int $t = 0; $t < $tables; $t++) {
      |    int $bucket = 0;
      |    for (int $b = 0; $b < $bits; $b++) {
      |      double[] $p = $planesRef[$t * $bits + $b];
      |      int $n = Math.min($a.numElements(), $p.length);
      |      double $s = 0.0;
      |      for (int $i = 0; $i < $n; $i++) { $s += $a.getDouble($i) * $p[$i]; }
      |      if ($s > 0) $bucket |= (1 << $b);
      |    }
      |    $out[$t] = $bucket;
      |  }
      |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** TRUE iff a raw embedding column holds an INDEXABLE vector: non-null
  * array, every slot non-null and finite, and AT LEAST ONE slot
  * nonzero (see [[graft.T.sqlIndexable]] for the DuckDB mirror and
  * T.indexableEmbedding for the contract — which adds the declared-
  * dimension clause on top). Never NULL itself — a missing vector is
  * simply not indexable.
  *
  * The NONZERO clause (round 14): an all-zero vector — the padding /
  * failed-encode row every real embedding table contains — has no
  * direction: zero norm turns every cosine into an ANSI
  * DIVIDE_BY_ZERO (measured: five llm_e3 queries crashed on a fixture
  * with 16 zero vectors), and its LSH hyperplane signs and centroid
  * assignments are arbitrary. Same posture as a NaN slot: dropped at
  * the read, one fused loop, no extra scan cost.
  *
  * Exists for two reasons over the `exists(embedding, …)` HOF
  * spelling: (1) HOFs are CodegenFallback, so the filter put one
  * interpreted expression on EVERY vector-op scan; (2) the HOF's
  * three-valued logic silently mapped a null SLOT to a null predicate
  * (dropped by filter) while DuckDB's list_filter EXCLUDES null
  * elements from the filtered list (len 0 → kept) — opposite verdicts
  * on slot-nulled vectors. This expression makes the slot-null case an
  * explicit `false` and the oracle spells `x IS NULL OR NOT
  * isfinite(x)` to match. */
final case class VecIndexable(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "vec_indexable"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.catalogString}")
  }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return false
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var nonzero = false
    while (i < n) {
      if (arr.isNullAt(i)) return false
      val d = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return false
      if (d != 0.0) nonzero = true
      i += 1
    }
    nonzero
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val get = if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        org.apache.spark.sql.catalyst.util.ArrayData $arr = ${c.value};
        int $n = $arr.numElements();
        boolean ${ev.value}_ok = true;
        boolean ${ev.value}_nz = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($arr.isNullAt($i)) { ${ev.value}_ok = false; break; }
          double $d = $get;
          if (Double.isNaN($d) || Double.isInfinite($d)) { ${ev.value}_ok = false; break; }
          if ($d != 0.0) ${ev.value}_nz = true;
        }
        ${ev.value} = ${ev.value}_ok && ${ev.value}_nz;
      }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Sequential-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** TRUE iff the vector is indexable (non-null, all slots finite,
    * not all-zero — see [[VecIndexable]]). */
  def vecIndexable(c: Column): Column =
    GraftColumnBridge.column(VecIndexable(GraftColumnBridge.expression(c)))

  /** array<int> of LSH bucket ids, one per table. */
  def lshBuckets(v: Column, planes: Seq[Array[Double]], tables: Int, bits: Int): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(v), planes.toArray, tables, bits))
}
