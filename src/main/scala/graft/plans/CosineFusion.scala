package graft.plans

import graft.functions.CosineSimilarity
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: fuse the higher-order-function cosine pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *       / (sqrt(aggregate(transform(a, x -> x * x), 0.0, +))
  *          * sqrt(aggregate(transform(b, x -> x * x), 0.0, +))) }}}
  *
  * into the codegen'd [[CosineSimilarity]] expression. The lambda
  * BODIES are matched down to their bound variables (x·y must
  * multiply exactly the two zip_with arguments, x·x must square the
  * transform argument, the merge must add the two accumulator args,
  * the finish must be identity) — a structurally similar but
  * different computation, e.g. normalized squared distance whose
  * zip_with lambda is (x-y)·(x-y), must NOT match.
  *
  * Injected via `graft.extensions.GraftExtensions`.
  */
object CosineFusion extends Rule[LogicalPlan] {

  /** x.exprId == y.exprId for named lambda variables. */
  private def sameVar(a: Expression, b: NamedLambdaVariable): Boolean =
    a match {
      case v: NamedLambdaVariable => v.exprId == b.exprId
      case _ => false
    }

  /** λ(x, y) → x * y over exactly the two bound variables. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _),
                        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** λ(x) → x * x over the single bound variable. */
  private def isSquare(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable), _) =>
      sameVar(l, x) && sameVar(r, x)
    case _ => false
  }

  /** λ(acc, v) → acc + v over exactly the two bound variables. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _),
                        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** λ(x) → x (aggregate's finish function). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(x: NamedLambdaVariable), _) => sameVar(body, x)
    case _ => false
  }

  private object ZeroD {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0.0, DoubleType) => true
      case _ => false
    }
  }

  /** aggregate(zip_with(a, b, x*y), 0.0, acc+v, identity). */
  private object DotHof {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(ZipWith(a, b, mult), ZeroD(), merge, finish)
          if isPairProduct(mult) && isSum(merge) && isIdentity(finish) =>
        Some((a, b))
      case _ => None
    }
  }

  /** sqrt(aggregate(transform(a, x*x), 0.0, acc+v, identity)). */
  private object NormHof {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(ArrayTransform(a, sq), ZeroD(), merge, finish))
          if isSquare(sq) && isSum(merge) && isIdentity(finish) =>
        Some(a)
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
