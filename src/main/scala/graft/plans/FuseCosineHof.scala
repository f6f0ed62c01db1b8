package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule tier (SURVEY.md §4.2 (c)): rewrite the higher-order
  * -function cosine formulation
  *
  * {{{ aggregate(zip_with(a,b,(x,y)->xd*yd), 0.0, (acc,v)->acc+v)
  *     / (sqrt(<same over (a,a)>) * sqrt(<same over (b,b)>)) }}}
  *
  * into the fused codegen'd [[CosineSim]] kernel. Users (and the
  * library's own Similarity module, historically) write the portable
  * HOF form; with this rule injected they get the no-allocation kernel
  * automatically.
  *
  * Sound because the kernel's ascending accumulation loop IS the HOF's
  * left fold per accumulator — bit-identical doubles (VectorExprSpec
  * asserts this over real data). The rewrite only fires on
  * `array<float>` inputs (the kernel reads floats) and only when the
  * three dot-folds are over (a,b), (a,a), (b,b) of semantically equal
  * arrays.
  */
object FuseCosineHof extends Rule[LogicalPlan] {

  /** Matches the canonical double-accumulating dot-product fold and
    * yields its two array inputs. */
  private object DotFold {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(l, r, LambdaFunction(
              Multiply(
                Cast(x: NamedLambdaVariable, DoubleType, _, _),
                Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
              Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(
              Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(aacc: NamedLambdaVariable, av: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(afin: NamedLambdaVariable), _))
          if x.exprId == ax.exprId && y.exprId == ay.exprId &&
            acc.exprId == aacc.exprId && v.exprId == av.exprId &&
            fin.exprId == afin.exprId &&
            zero.foldable && zero.eval() == 0.0d =>
        Some((l, r))
      case _ => None
    }
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            DotFold(a, b),
            Multiply(Sqrt(DotFold(a2, a3)), Sqrt(DotFold(b2, b3)), _), _)
          if isFloatArray(a) && isFloatArray(b) &&
            a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) =>
        CosineSim(a, b)
    }
}
