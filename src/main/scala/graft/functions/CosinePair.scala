package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression for cosine(a, b) over two vector COLUMNS —
 * the candidate-verification hot path of the embedding near-dup family
 * ([[graft.ops.Dedup.verifyCosine]]): at scale the LSH candidate set is
 * the dominant volume, and each pair previously ran THREE interpreted
 * `aggregate`/`zip_with` folds (dot, |a|², |b|²); this emits one fused
 * primitive loop via `doGenCode` accumulating all three.
 *
 * Semantics bitwise-pinned to the replaced SQL (CosineExprSpec pair
 * differential; oracle-gated by q_embedding_neardup / q_neardup_drops):
 *  - each accumulator folds left-to-right independently — identical
 *    doubles to the three separate `aggregate` folds;
 *  - denominator `sqrt(|a|²) * sqrt(|b|²)` (two square roots, NOT
 *    sqrt of the product — FP-distinct);
 *  - NULL elements or a length mismatch null the numerator (zip_with
 *    padding semantics) and therefore the result;
 *  - zero denominator yields NULL (ANSI-safe nullif).
 */
case class CosinePair(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine_pair"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = av.numElements()
    if (n != bv.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (av.isNullAt(i) || bv.isNullAt(i)) return null
      val x = if (lf) av.getFloat(i).toDouble else av.getDouble(i)
      val y = if (rf) bv.getFloat(i).toDouble else bv.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else java.lang.Double.valueOf(dot / den)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getX =
        if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY =
        if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    double $x = $getX;
         |    double $y = $getY;
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($bad || $den == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosinePair =
    copy(left = newLeft, right = newRight)
}
