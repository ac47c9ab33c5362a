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
  * VectorExprs); the rewrite is semantics-preserving bit-for-bit because
  * DotProduct evaluates the identical sequential fold — same element
  * order, same FP operations (x·y products are commutative in IEEE, as
  * is each single a+b rounding, so either lambda argument order matches).
  *
  * This is the (c)-tier Catalyst extension surface of the build brief —
  * a `Rule[LogicalPlan]` registered through `SparkSessionExtensions`
  * (`injectOptimizerRule`) — used where it actually pays: users write
  * the declarative HOF form, plans execute the fused loop.
  *
  * Conservative by design: fires only on exactly the shape above over
  * array<double> columns with a literal 0.0 seed and an identity finish
  * lambda; anything else (casts, different seeds, extra arithmetic) is
  * left to the interpreted HOF path.
  */
object VectorizeDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** body is `x ∘ y` (either argument order) over exactly the two lambda vars. */
  private def usesBothVars(l: Expression, r: Expression,
      x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean =
    (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(ml, mr, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(al, ar, _), Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero == 0.0 && isDoubleArray(a) && isDoubleArray(b) &&
          usesBothVars(ml, mr, x, y) && usesBothVars(al, ar, acc, el) &&
          sameVar(fin, fv) =>
      DotProduct(a, b)
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
