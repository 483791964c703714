package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for cosine(embedding, QUERY) against one
 * broadcast-literal query vector — the ANN hot path
 * ([[graft.ops.Similarity]] brute-force / LSH-probe / IVF-probe ranking).
 *
 * Replaces the `aggregate(zip_with(...))` higher-order-function
 * composition: HOF lambdas evaluate interpreted (per element, per row,
 * with boxed lambda variables) and break the whole-stage-codegen span;
 * this expression emits one fused primitive loop via `doGenCode`
 * (measured 5.5x on a 200k x 64-dim ranking scan, graft.tools.CosineBench).
 *
 * Semantics are EXACTLY the replaced composition's (differentially pinned
 * by CosineExprSpec over the old SQL; oracle-gated end-to-end by
 * q_cosine_topk / q_ann_lsh_topk / q_ann_ivf_topk):
 *  - left-to-right summation order for both dot and norm accumulators
 *    (bitwise-identical doubles to `aggregate`'s fold);
 *  - any NULL element nulls the result (zip_with product / aggregate sum
 *    null propagation);
 *  - a length mismatch nulls the result (zip_with pads the shorter side
 *    with NULL);
 *  - zero denominator nulls the result (the ANSI-safe `nullif` guard —
 *    never a divide-by-zero throw).
 */
case class CosineToQuery(child: Expression, q: Seq[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_to_query"

  private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val qArr: Array[Double] = q.toArray
  // query norm, same fold order as the driver-side math.sqrt(sum) it replaces
  private lazy val nb: Double = math.sqrt(q.map(v => v * v).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != qArr.length) return null
    var dot = 0.0
    var na = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      dot += x * qArr(i)
      na += x * x
      i += 1
    }
    val den = math.sqrt(na) * nb
    if (den == 0.0) null else java.lang.Double.valueOf(dot / den)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val qRef = ctx.addReferenceObj("qvec", qArr, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val den = ctx.freshName("den")
      val x = ctx.freshName("x")
      val getX =
        if (elemIsFloat) s"(double) $c.getFloat($i)" else s"$c.getDouble($i)"
      s"""
         |int $n = $c.numElements();
         |boolean $bad = ($n != ${qArr.length});
         |double $dot = 0.0;
         |double $na = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($c.isNullAt($i)) { $bad = true; break; }
         |    double $x = $getX;
         |    $dot += $x * $qRef[$i];
         |    $na += $x * $x;
         |  }
         |}
         |double $den = java.lang.Math.sqrt($na) *
         |  java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToRawLongBits(nb)}L); // raw-bits literal: "InfinityD"/"NaND" would not compile
         |if ($bad || $den == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CosineToQuery =
    copy(child = newChild)
}
