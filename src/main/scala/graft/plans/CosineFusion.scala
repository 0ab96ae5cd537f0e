package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: fuse the higher-order-function cosine pattern
  *
  * {{{ aggregate(zip_with(a, b, *), 0.0, +)
  *       / (sqrt(aggregate(transform(a, x*x), 0.0, +))
  *          * sqrt(aggregate(transform(b, x*x), 0.0, +))) }}}
  *
  * into the codegen'd [[CosineSimilarity]] expression. Users writing
  * the public-API HOF form (three interpreted array traversals with a
  * lambda frame per element) silently get the single fused loop.
  * Semantics-preserving incl. NULL behavior: mismatched array lengths
  * null the HOF aggregate, and [[CosineSimilarity]] returns NULL for
  * those too.
  *
  * Injected via `graft.extensions.GraftExtensions`
  * (`injectOptimizerRule`).
  */
object CosineFusion extends Rule[LogicalPlan] {

  /** Matches aggregate(zip_with(x, y, mult-lambda), 0.0, add-lambda). */
  private object DotHof {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(_, _, _), _, _)),
            DoubleLit(0.0),
            LambdaFunction(Add(_, _, _), _, _),
            LambdaFunction(_, _, _)) =>
        Some((a, b))
      case _ => None
    }
  }

  /** Matches sqrt(aggregate(transform(x, sq-lambda), 0.0, add-lambda)). */
  private object NormHof {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
            ArrayTransform(a, LambdaFunction(Multiply(_, _, _), _, _)),
            DoubleLit(0.0),
            LambdaFunction(Add(_, _, _), _, _),
            LambdaFunction(_, _, _))) =>
        Some(a)
      case _ => None
    }
  }

  private object DoubleLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotHof(a, b), Multiply(NormHof(a2), NormHof(b2), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(a, b)
    }
}
