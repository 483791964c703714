package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.pipeline.SparkTestBase

/** graft.functions.SigAgreement (native doGenCode expression) must be
  * identical to the `aggregate(zip_with(a, b, (x, y) -> IF(x = y, 1, 0)),
  * 0, (acc, v) -> acc + v)` fold it replaced on the MinHash est_jaccard
  * hot path — across null elements, length mismatches, null sides, and
  * empty arrays (where the fold counts 0, it does NOT null out like the
  * cosine family) — and must actually run inside whole-stage codegen. */
class SigAgreementSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def nativeCol(a: String, b: String) =
    ColumnBridge.column(SigAgreement(
      ColumnBridge.expression(col(a)), ColumnBridge.expression(col(b))))

  private def hofCol(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")

  test("parity with the HOF fold on adversarial signatures") {
    var st = 42L
    def nextSig(): java.lang.Long = {
      st = st * 6364136223846793005L + 1442695040888963407L
      // tiny value space so positions genuinely collide
      java.lang.Long.valueOf((st >>> 16) % 7L)
    }
    def vec(n: Int): Seq[java.lang.Long] = Seq.fill(n)(nextSig())
    val rows: Seq[(Int, Seq[java.lang.Long], Seq[java.lang.Long])] =
      (0 until 300).map(i => (i, vec(32), vec(32))) ++ Seq(
        (1000, vec(32).updated(5, null.asInstanceOf[java.lang.Long]), vec(32)), // null elem -> that position counts 0
        (1001, vec(32), vec(30)),  // shorter right: padded tail counts 0
        (1002, vec(28), vec(32)),  // shorter left
        (1003, vec(32), null),     // null side -> NULL result
        (1004, Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]), // empty -> 0, not NULL
        (1005, (1L to 32L).map(java.lang.Long.valueOf),
               (1L to 32L).map(java.lang.Long.valueOf))) // full agreement
    val df = rows.toDF("id", "mh_a", "mh_b").persist()
    def get(c: org.apache.spark.sql.Column): Map[Int, Any] =
      df.select($"id", c.as("v")).collect()
        .map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    val native = get(nativeCol("mh_a", "mh_b"))
    val hof = get(hofCol("mh_a", "mh_b"))
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, v) => assert(v == hof(id), s"id=$id") }
    assert(native(1003) == null)
    assert(native(1004) == 0)
    assert(native(1005) == 32)
    // the dense value space must actually produce nonzero agreement
    assert((0 until 300).exists(i => native(i).asInstanceOf[Int] > 0))
    df.unpersist()
  }

  test("the native expression runs inside WholeStageCodegen") {
    val df = Seq((1, Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)))
      .toDF("id", "mh_a", "mh_b")
      .repartition(1)
      .select(nativeCol("mh_a", "mh_b").as("agree"))
    val out = df.collect()
    assert(out.head.getInt(0) == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
