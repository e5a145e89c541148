package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{CosineSimilarityExpr, DotProductExpr}

/** Optimizer rule: rewrite the declarative higher-order-function vector
  * patterns into graft's fused codegen expressions.
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     ==> DotProductExpr(a, b)
  *   dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  *     ==> CosineSimilarityExpr(a, b)
  *
  * A user (or generated SQL) writing the portable HOF formulation gets the
  * fused loop automatically — the HOF path walks an interpreted lambda per
  * element; the rewritten expressions are one codegen'd loop inside
  * whole-stage codegen. The rewrite is bitwise value-preserving: identical
  * left-to-right double accumulation, and both sides agree that a length
  * mismatch is null (zip_with null-pads → the aggregate goes null).
  *
  * Injected by `GraftExtensions` via `injectOptimizerRule`; also usable
  * directly through `spark.experimental.extraOptimizations`.
  */
object RewriteVectorOps extends Rule[LogicalPlan] {

  private def isVectorArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isIdentityLambda(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _)
      => v.exprId == a.exprId
    case _ => false
  }

  /** Matches the HOF dot-product pattern, binding the two array inputs. */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x: NamedLambdaVariable,
              y: NamedLambdaVariable, _),
              Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(m1: NamedLambdaVariable,
            m2: NamedLambdaVariable, _),
            Seq(q1: NamedLambdaVariable, q2: NamedLambdaVariable), _),
          finish)
        if zero == 0.0 && isIdentityLambda(finish) &&
          Set(x.exprId, y.exprId) == Set(p1.exprId, p2.exprId) &&
          Set(m1.exprId, m2.exprId) == Set(q1.exprId, q2.exprId) &&
          isVectorArray(a) && isVectorArray(b) =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val dotted = plan.transformAllExpressions {
      case HofDot(a, b) => DotProductExpr(a, b)
    }
    dotted.transformAllExpressions {
      // LEGACY divide only: under ANSI a zero-norm vector must raise
      // DIVIDE_BY_ZERO and under TRY it must go null — the fused
      // expression's raw Java division (NaN) would observably change the
      // query outcome. The dot rewrite above is mode-independent (double
      // arithmetic never throws), so ANSI sessions still get fused dots
      // under the original Divide node.
      // the guard uses the evalMode ACCESSOR: Divide's third constructor
      // param is a NumericEvalContext wrapper in Spark 4.1, so a bare
      // EvalMode pattern never matches
      case d @ Divide(DotProductExpr(a1, b1),
          Multiply(Sqrt(DotProductExpr(a2, a3)),
            Sqrt(DotProductExpr(b2, b3)), _), _)
        if d.evalMode == EvalMode.LEGACY &&
          a1.semanticEquals(a2) && a2.semanticEquals(a3) &&
          b1.semanticEquals(b2) && b2.semanticEquals(b3) =>
        CosineSimilarityExpr(a1, b1)
    }
  }
}
