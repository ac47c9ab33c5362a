package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the composable-but-interpreted dot-product
  * formulation
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression. The HOF
  * form costs ~450 ns/element in lambda dispatch (measured, see
  * VectorExprs); the rewrite preserves results bit-for-bit because
  * DotProduct evaluates the identical sequential fold — same element
  * order, same FP operations (x·y products are commutative in IEEE, as
  * is each single a+b rounding, so either lambda argument order matches).
  *
  * This is the (c)-tier Catalyst extension surface of the build brief —
  * a `Rule[LogicalPlan]` registered through `SparkSessionExtensions`
  * (`injectOptimizerRule`) — used where it actually pays: users write
  * the declarative HOF form, plans execute the fused loop.
  *
  * Conservative by design, because the rule is injected into EVERY
  * session via `spark.sql.extensions` and must therefore never change
  * the result of an arbitrary user query:
  *  - both inputs must be array<double> or both array<float> (same
  *    element type both sides). Nullable ELEMENTS are fine as of round
  *    9: DotProduct now propagates a null slot to a NULL result —
  *    exactly the HOF's poisoned fold — so the schema shape parquet
  *    produces by default (containsNull = true) takes the fused loop
  *    too, with the slot check compiled in only for those schemas.
  *    Float inputs match the analyzed merge shape
  *    `acc + cast(v as double)` and DotProduct keeps the
  *    float-multiply/double-accumulate semantics bit-for-bit.
  *  - the seed must be literal +0.0 — bit-checked via doubleToLongBits,
  *    because `-0.0 == 0.0` numerically but the HOF returns -0.0 for
  *    empty arrays where DotProduct returns +0.0 (distinct under a
  *    bit-exact hash compare).
  *  - unequal-length arrays: zip_with null-pads the shorter side, so the
  *    HOF yields NULL; the rewrite emits
  *    `if (size(a) = size(b)) vec_dot(a, b) else null` to match (size()
  *    of a NULL array is NULL → predicate NULL → else branch → NULL,
  *    which also matches the HOF's null-input behavior).
  * Anything else (casts, other seeds, extra arithmetic, nullable
  * elements) is left untouched.
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  /** array<double> or array<float> — the two element types
    * [[DotProduct]] reproduces bit-exactly (float inputs: float
    * multiply, double accumulate — see the expression's doc). Element
    * nullability is irrelevant to eligibility: DotProduct propagates
    * null slots to NULL exactly as the HOF fold does. */
  private def vectorElemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** The merge lambda over float elements is analyzed as
    * `Add(acc, Cast(el, double))` — the widening cast the analyzer
    * inserts is part of the canonical shape, not a user transformation,
    * so the match looks through exactly that cast (float→double is
    * mode-independent and lossless). */
  private def sameVarMaybeWidened(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case Cast(n: NamedLambdaVariable, DoubleType, _, _) =>
      n.dataType == FloatType && n.exprId == v.exprId
    case _ => false
  }

  /** body is `x ∘ y` (either argument order) over exactly the two lambda vars. */
  private def usesBothVars(l: Expression, r: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))

  /** like [[usesBothVars]] but tolerating the analyzer's float→double
    * widening cast on either argument (the merge-lambda shape). */
  private def usesBothVarsWidened(l: Expression, r: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (sameVarMaybeWidened(l, x) && sameVarMaybeWidened(r, y)) ||
      (sameVarMaybeWidened(l, y) && sameVarMaybeWidened(r, x))

  private def isPositiveZero(v: Any): Boolean = v match {
    case d: java.lang.Double => java.lang.Double.doubleToLongBits(d) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isPositiveZero(zero) &&
          vectorElemType(a).isDefined && vectorElemType(a) == vectorElemType(b) &&
          // the rewrite duplicates a and b into Size() and DotProduct();
          // nondeterministic children could diverge between the copies
          a.deterministic && b.deterministic &&
          usesBothVars(ml, mr, x, y) && usesBothVarsWidened(al, ar, acc, el) &&
          sameVar(fin, fv) =>
      If(EqualTo(new Size(a), new Size(b)), DotProduct(a, b), Literal(null, DoubleType))
  }
}

object GraftOptimizations {
  /** Install the graft optimizer rules into a live session (tests /
    * REPL). The `spark.sql.extensions` path is
    * [[graft.functions.GraftExtensions]]. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VectorizeDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorizeDotProduct
    }
}
