package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/**
 * Analyzer rule rewriting the declarative cosine SHAPE —
 * `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +) / nullif(sqrt(|a|²) *
 * sqrt(|b|²), 0)` — into the native codegen expressions
 * ([[CosinePair]] / [[CosineToQuery]]), so a user who writes the plain
 * SQL (the portable form this engine itself shipped before round 4, and
 * the form the DuckDB oracle still uses) gets the fused 5.5× loop
 * without changing a line.
 *
 * Runs POST-HOC in the analyzer: by optimization time the shape is gone —
 * `NullIf` is runtime-replaced and the denominator is split into a child
 * Project by common-subexpression elimination (see
 * graft.tools.CosinePlanProbe), so no single optimizer expression ever
 * contains the whole pattern.
 *
 * Strictly conservative: the rewrite fires only when the lambdas are
 * exactly the dot/sum/identity shapes, the zero literals are doubles,
 * the norm arguments are semantically the SAME expressions as the dot's,
 * the arrays are float/double, and — for the literal-query form — the
 * precomputed norm literal is BITWISE equal to the norm of the extracted
 * query vector. Anything else is left untouched. Both rewrites are
 * bitwise-identical by construction (CosineExprSpec differentials).
 *
 * Enable with `spark.sql.extensions=graft.functions.GraftExtensions`
 * (submit-time — it is a STATIC conf, read from the SparkContext's own
 * configuration) or programmatically with
 * `SparkSession.builder().withExtensions(new GraftExtensions)`.
 */
object CosineRewrite extends Rule[LogicalPlan] {

  private def stripCastToDouble(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => c
    case _ => e
  }

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripCastToDouble(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(z: Double, DoubleType) => z == 0.0
    case _ => false
  }

  /** (acc, w) -> acc + w */
  private def isSumLambda(lf: Expression): Boolean = lf match {
    case LambdaFunction(Add(l, r, _),
        Seq(a: NamedLambdaVariable, w: NamedLambdaVariable), false) =>
      sameVar(l, a) && sameVar(r, w)
    case _ => false
  }

  /** id -> id */
  private def isIdentLambda(lf: Expression): Boolean = lf match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), false) =>
      sameVar(body, v)
    case _ => false
  }

  /** (acc, v) -> acc + v*v  (the single-array norm fold) */
  private def isNormLambda(lf: Expression): Boolean = lf match {
    case LambdaFunction(Add(l, Multiply(m1, m2, _), _),
        Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), false) =>
      sameVar(l, a) && sameVar(m1, v) && sameVar(m2, v)
    case _ => false
  }

  private def isVecType(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })

  /** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, sum, id) → (a, b) */
  private object DotAgg {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), false)),
          zero, merge, finish)
        if isZeroD(zero) && sameVar(mx, x) && sameVar(my, y) &&
          isSumLambda(merge) && isIdentLambda(finish) => Some((a, b))
      case _ => None
    }
  }

  /** aggregate(a, 0.0, (acc,v) -> acc + v*v, id) → a */
  private object NormAgg {
    def unapply(e: Expression): Option[Expression] = e match {
      case ArrayAggregate(a, zero, merge, finish)
        if isZeroD(zero) && isNormLambda(merge) && isIdentLambda(finish) =>
        Some(a)
      case _ => None
    }
  }

  /** A foldable double-valued expression → its value. */
  private object FoldedD {
    def unapply(e: Expression): Option[Double] =
      if (e.resolved && e.foldable && e.dataType == DoubleType)
        Option(e.eval(null)).map(_.asInstanceOf[Double])
      else None
  }

  /** A foldable array<double> expression → its values (none may be null). */
  private object FoldedVec {
    def unapply(e: Expression): Option[Seq[Double]] =
      if (e.resolved && e.foldable &&
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == DoubleType) {
        Option(e.eval(null))
          .map(_.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
          .filter { ad =>
            !(0 until ad.numElements()).exists(ad.isNullAt)
          }
          .map(_.toDoubleArray().toIndexedSeq)
      } else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan transformAllExpressions {
      // pair form: dot(a,b) / nullif(sqrt(dot(a,a)) * sqrt(dot(b,b)), 0)
      case Divide(DotAgg(a, b),
          NullIf(Multiply(Sqrt(DotAgg(a2, a3)), Sqrt(DotAgg(b2, b3)), _),
            zero, _), _)
        if isZeroD(zero) && isVecType(a) && isVecType(b) &&
          a2.semanticEquals(a) && a3.semanticEquals(a) &&
          b2.semanticEquals(b) && b3.semanticEquals(b) =>
        CosinePair(a, b)
      // literal-query form: dot(a, Q) / nullif(sqrt(norm(a)) * NB, 0)
      // — only when NB is bitwise the norm of the extracted Q
      case Divide(DotAgg(a, FoldedVec(q)),
          NullIf(Multiply(Sqrt(NormAgg(a2)), FoldedD(nb), _), zero, _), _)
        if isZeroD(zero) && isVecType(a) && a2.semanticEquals(a) &&
          java.lang.Double.doubleToRawLongBits(math.sqrt(q.map(v => v * v).sum)) ==
            java.lang.Double.doubleToRawLongBits(nb) =>
        CosineToQuery(a, q)
    }
}

/** `spark.sql.extensions` entry point registering the graft analyzer
  * rules (currently [[CosineRewrite]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPostHocResolutionRule(_ => CosineRewrite)
}
