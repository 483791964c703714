package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expression counting position-wise agreement between two
 * MinHash signature COLUMNS — the est_jaccard numerator on the near-dup
 * candidate hot path ([[graft.ops.Dedup.lshCandidatePairs]] /
 * [[graft.ops.Dedup.incrementalLshPairs]]): at scale the candidate-pair
 * set is the dominant volume after banding, and each pair previously ran
 * an interpreted `aggregate(zip_with(...))` fold (per element, per row,
 * boxed lambda variables, breaking the whole-stage-codegen span) — the
 * exact shape [[CosinePair]] replaced for a measured 5.5x
 * (VERDICT r04 wrong #3). This emits one fused primitive loop via
 * `doGenCode` (measured in graft.tools.SigAgreementBench).
 *
 * Semantics are EXACTLY the replaced composition's
 * `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)`
 * (differentially pinned by SigAgreementSpec; oracle-gated end-to-end by
 * q_minhash_lsh_pairs / q_lsh_incremental / q_neardup_drops):
 *  - a position counts 1 iff BOTH elements are non-null and equal —
 *    `zip_with` pads the shorter array with NULLs, `x = y` with any NULL
 *    is NULL, and `IF(NULL, 1, 0)` takes the false branch, so padded or
 *    null positions contribute 0 (NOT a null result — unlike the cosine
 *    family's zip_with PRODUCT, whose null propagates through the sum);
 *  - a whole-array NULL on either side nulls the result (zip_with null
 *    propagation = BinaryExpression null intolerance);
 *  - result is the fold's IntegerType (seed 0, int additions; bounded by
 *    the signature length, so ANSI int addition can never overflow).
 */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_sig_agreement"

  private def elemIsInt(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType | IntegerType, _),
            ArrayType(LongType | IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int|bigint>, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    val lf = elemIsInt(left)
    val rf = elemIsInt(right)
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!av.isNullAt(i) && !bv.isNullAt(i)) {
        val x = if (lf) av.getInt(i).toLong else av.getLong(i)
        val y = if (rf) bv.getInt(i).toLong else bv.getLong(i)
        if (x == y) cnt += 1
      }
      i += 1
    }
    java.lang.Integer.valueOf(cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val getX =
        if (elemIsInt(left)) s"(long) $a.getInt($i)" else s"$a.getLong($i)"
      val getY =
        if (elemIsInt(right)) s"(long) $b.getInt($i)" else s"$b.getLong($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $getX == $getY) {
         |    $cnt++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}
