package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.CosineSim

/** Optimizer rule: rewrite the canonical higher-order-function cosine —
  * `aggregate(zip_with(a,b,*),0.0,+) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`,
  * the exact tree `Similarity.cosineHof`/`dot` build — into the fused
  * codegen `CosineSim(a, b)`: one primitive loop instead of three
  * interpreted array traversals with intermediate arrays (measured 64×
  * on the signature path; the HOF family is the repo's documented
  * perf trap).
  *
  * OPT-IN (`spark.graft.fuseCosine.enabled`, default false): the fused
  * expression deliberately returns NULL for zero-norm vectors and
  * length mismatches where the HOF form raises under ANSI mode
  * (`VectorExprs` doc) — a semantics change on degenerate inputs that
  * must be the user's choice, not a silent optimizer default.
  *
  * Registered by `GraftExtensions` (builder path) or via
  * `spark.experimental.extraOptimizations` on a live session.
  */
object FuseCosine extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  /** The lambda body must use BOTH bound parameters, once each —
    * `x*x` or `s+s` is not a dot/sum and must not fuse. */
  private def usesBothParams(l: Expression, r: Expression,
                             params: Seq[NamedLambdaVariable]): Boolean =
    (stripCast(l), stripCast(r)) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        params.length == 2 &&
          Set(a.exprId, b.exprId) == params.map(_.exprId).toSet
      case _ => false
    }

  /** CosineSim's loop reads 8-byte doubles / 4-byte floats; any other
    * element type would mis-read raw ArrayData after the unchecked
    * post-analysis rewrite. */
  private def fusableArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Matches `aggregate(zip_with(x, y, (p,q) -> p*q), 0.0, (a,v) -> a+v)`
    * with the identity finish lambda — the `Similarity.dot` shape. */
  private object Dot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(x, y, LambdaFunction(mul: Multiply, mulArgs, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add: Add, addArgs, _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _))
          if usesBothParams(mul.left, mul.right,
              mulArgs.collect { case v: NamedLambdaVariable => v }) &&
            usesBothParams(add.left, add.right,
              addArgs.collect { case v: NamedLambdaVariable => v }) &&
            fin.exprId == arg.exprId &&
            fusableArray(x) && fusableArray(y) =>
        Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.fuseCosine.enabled", "false") != "true") plan
    else plan.transformAllExpressions {
      case d: Divide => (d.left, d.right) match {
        case (Dot(a, b), m: Multiply) => (m.left, m.right) match {
          case (Sqrt(Dot(a1, a2)), Sqrt(Dot(b1, b2)))
              if a1.semanticEquals(a) && a2.semanticEquals(a) &&
                b1.semanticEquals(b) && b2.semanticEquals(b) =>
            CosineSim(a, b)
          case _ => d
        }
        case _ => d
      }
    }
}
