package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** The injected analyzer rule must rewrite the declarative cosine SQL
  * shape into the native expressions — visible in the analyzed plan —
  * with bitwise-unchanged results; near-miss shapes must be left alone. */
class CosineRewriteSpec extends AnyFunSuite {

  /** A sibling session on the SAME SparkContext with GraftExtensions
    * registered (getOrCreate would return the extension-less base
    * session unless active/default are cleared first). */
  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // programmatic registration: the spark.sql.extensions STATIC conf is
      // only read from the SparkContext's own conf (set at submit time);
      // a sibling session on an existing context must use withExtensions
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  private val pairSql =
    """aggregate(zip_with(v_a, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
      |          0D, (acc, w) -> acc + w)
      | / nullif(sqrt(aggregate(zip_with(v_a, v_a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, w) -> acc + w))
      |          * sqrt(aggregate(zip_with(v_b, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, w) -> acc + w)), 0D)
      |""".stripMargin

  test("the SQL pair shape is rewritten to graft_cosine_pair, same bits") {
    withExtendedSession { s =>
      import s.implicits._
      var st = 5L
      def nextF(): Float = {
        st = st * 6364136223846793005L + 1442695040888963407L
        ((st >>> 16) % 1000L) / 250.0f - 2.0f
      }
      val df = s.range(64)
        .map(_ => (Seq.fill(8)(nextF()), Seq.fill(8)(nextF())))
        .toDF("v_a", "v_b")
      val rewritten = df.select(expr(pairSql).as("c"))
      assert(rewritten.queryExecution.analyzed.toString
        .contains("graft_cosine_pair"), rewritten.queryExecution.analyzed)
      val a = rewritten.as[Double].collect().map(java.lang.Double.doubleToRawLongBits)
      // reference: the native expression applied directly (itself
      // differentially pinned to the HOF SQL in CosineExprSpec)
      val direct = df.select(
        org.apache.spark.sql.graftbridge.ColumnBridge.column(CosinePair(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression($"v_a"),
          org.apache.spark.sql.graftbridge.ColumnBridge.expression($"v_b"))).as("c"))
        .as[Double].collect().map(java.lang.Double.doubleToRawLongBits)
      assert(a.sorted.sameElements(direct.sorted))
    }
  }

  test("the literal-query shape is rewritten to graft_cosine_to_query") {
    withExtendedSession { s =>
      import s.implicits._
      val df = s.range(16).map(i => Seq(i.toFloat, 1.0f, 2.0f)).toDF("v_a")
      val q = Array(0.5f, 0.25f, 1.5f)
      val col = graft.ops.Similarity.cosineToQueryHof("v_a", q)
      val out = df.select(col.as("c"))
      assert(out.queryExecution.analyzed.toString
        .contains("graft_cosine_to_query"), out.queryExecution.analyzed)
      assert(out.filter($"c".isNotNull).count() == 16)
    }
  }

  test("near-miss shapes are left untouched") {
    withExtendedSession { s =>
      import s.implicits._
      val df = s.range(4).map(i => (Seq(i.toFloat, 1.0f), Seq(2.0f, i.toFloat)))
        .toDF("v_a", "v_b")
      // norm over the WRONG vector (b instead of a) — must NOT rewrite
      val wrong =
        """aggregate(zip_with(v_a, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, w) -> acc + w)
          | / nullif(sqrt(aggregate(zip_with(v_b, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, w) -> acc + w))
          |          * sqrt(aggregate(zip_with(v_b, v_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, w) -> acc + w)), 0D)
          |""".stripMargin
      val out = df.select(expr(wrong).as("c"))
      val an = out.queryExecution.analyzed.toString
      assert(!an.contains("graft_cosine"), an)
      // a different zero literal (1D) — must NOT rewrite
      val wrongZero = pairSql.replace(", 0D)\n", ", 1D)\n")
      val an2 = df.select(expr(wrongZero).as("c")).queryExecution.analyzed.toString
      assert(!an2.contains("graft_cosine"), an2)
    }
  }

  test("the base session (no extensions) is unaffected") {
    val s = SparkTestBase.spark
    import s.implicits._
    val df = s.range(4).map(i => (Seq(i.toFloat, 1.0f), Seq(2.0f, i.toFloat)))
      .toDF("v_a", "v_b")
    val an = df.select(expr(pairSql).as("c")).queryExecution.analyzed.toString
    assert(!an.contains("graft_cosine"), an)
  }
}
