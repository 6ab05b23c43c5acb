package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.FloatDotProduct

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0.0, (acc, v) -> acc + v)
  *
  * into the codegen'd [[FloatDotProduct]] when both inputs are
  * array<float>. Bit-identical semantics — same left-fold of double
  * products, and FloatDotProduct mirrors the HOF's degenerate cases
  * too (unequal lengths or a null element → NULL, exactly what
  * zip_with's null padding + `acc + null` produce), so the rewrite is
  * safe on ragged inputs as well; it exists because the HOF form
  * evaluates per-element through lambda objects outside whole-stage
  * codegen (~8× slower on the similarity benchmarks).
  *
  * Users who write the natural declarative form get the fast plan
  * automatically — the Catalyst way to ship a kernel.
  */
object DotProductFusion extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Matches (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE). */
  private def isDoubleProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(Cast(x: NamedLambdaVariable, DoubleType, _, _),
                                 Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  /** Matches (acc, v) -> acc + v. */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  private def isZeroLiteral(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mergeFn), zero, aggFn, finishFn)
        if isFloatArray(a) && isFloatArray(b) && isDoubleProductLambda(mergeFn)
          && isZeroLiteral(zero) && isSumLambda(aggFn)
          && (finishFn match { // identity finish: id -> id
            case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
              v.exprId == arg.exprId
            case _ => false
          }) =>
      FloatDotProduct(a, b)
  }
}

/** Session extensions: inject the fusion rule and the float_dot SQL
  * function. Activate with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DotProductFusion)
    e.injectOptimizerRule(_ => BandedRangeJoin)
  }
}
