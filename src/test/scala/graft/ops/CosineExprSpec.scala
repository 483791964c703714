package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

/** graft.functions.CosineToQuery (native doGenCode expression) must be
  * BITWISE-identical to the aggregate(zip_with(...)) HOF composition it
  * replaced, across nulls, length mismatches, zero norms, and empty
  * arrays — and must actually run inside whole-stage codegen. */
class CosineExprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("bitwise parity with the HOF composition on adversarial vectors") {
    val dim = 16
    val q = lcg(7L).take(dim).map(x => ((x >>> 16) % 1000L) / 250.0f - 2.0f).toArray
    var st = 42L
    def nextF(): Float = {
      st = st * 6364136223846793005L + 1442695040888963407L
      ((st >>> 16) % 1000L) / 250.0f - 2.0f
    }
    def vec(n: Int): Seq[java.lang.Float] =
      Seq.fill(n)(java.lang.Float.valueOf(nextF()))
    val rows: Seq[(Int, Seq[java.lang.Float])] =
      (0 until 200).map(i => (i, vec(dim))) ++ Seq(
        (1000, vec(dim).updated(3, null.asInstanceOf[java.lang.Float])), // null elem
        (1001, vec(dim - 1)), // shorter than q
        (1002, vec(dim + 2)), // longer than q
        (1003, Seq.fill(dim)(java.lang.Float.valueOf(0.0f))), // zero norm
        (1004, Seq.empty[java.lang.Float]), // empty
        (1005, null)) // null array
    val df = rows.toDF("id", "embedding").persist()
    val native = df.select($"id", Similarity.cosineToQuery("embedding", q).as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(r.getDouble(1))))).toMap
    val hof = df.select($"id", Similarity.cosineToQueryHof("embedding", q).as("c"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(r.getDouble(1))))).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, bits) => assert(bits == hof(id), s"id=$id") }
    // the adversarial rows are all NULL results in BOTH implementations
    Seq(1000, 1001, 1002, 1003, 1004, 1005).foreach { id =>
      assert(native(id) == null, s"id=$id should be null")
    }
    assert(native(0) != null)
    df.unpersist()
  }

  test("pair cosine: bitwise parity with the three-fold HOF composition") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val dim = 12
    var st = 7L
    def nextF(): Float = {
      st = st * 6364136223846793005L + 1442695040888963407L
      ((st >>> 16) % 1000L) / 250.0f - 2.0f
    }
    def vec(n: Int): Seq[java.lang.Float] =
      Seq.fill(n)(java.lang.Float.valueOf(nextF()))
    val rows: Seq[(Int, Seq[java.lang.Float], Seq[java.lang.Float])] =
      (0 until 150).map(i => (i, vec(dim), vec(dim))) ++ Seq(
        (1000, vec(dim).updated(2, null.asInstanceOf[java.lang.Float]), vec(dim)),
        (1001, vec(dim), vec(dim - 2)), // length mismatch
        (1002, Seq.fill(dim)(java.lang.Float.valueOf(0.0f)), vec(dim)), // zero |a|
        (1003, vec(dim), null), // null side
        (1004, Seq.empty[java.lang.Float], Seq.empty[java.lang.Float]))
    val df = rows.toDF("id", "v_a", "v_b").persist()
    def bits(r: org.apache.spark.sql.Row) =
      r.getInt(0) -> (if (r.isNullAt(1)) null
        else java.lang.Long.valueOf(java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
    val native = df.select($"id", ColumnBridge.column(graft.functions.CosinePair(
        ColumnBridge.expression($"v_a"), ColumnBridge.expression($"v_b"))).as("c"))
      .collect().map(bits).toMap
    val hof = df.select($"id", Dedup.verifyCosineHofCol("v_a", "v_b").as("c"))
      .collect().map(bits).toMap
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, b) => assert(b == hof(id), s"id=$id") }
    Seq(1000, 1001, 1002, 1003, 1004).foreach(id => assert(native(id) == null, s"id=$id"))
    assert(native(0) != null)
    df.unpersist()
  }

  test("non-finite query norm generates compilable code and matches interpreted NaN") {
    // a query vector with an Infinity component makes the precomputed norm
    // Infinity; the generated literal must round-trip through raw bits
    // (a plain "InfinityD" source literal fails to compile and silently
    // drops the expression to interpreted fallback)
    // (no HOF baseline here: a SQL "Infinity" literal doesn't parse, which
    // is itself why only the native expression can take this input)
    val q = Array(Float.PositiveInfinity, 1.0f)
    val df = Seq((1, Seq(1.0f, 2.0f))).toDF("id", "embedding").repartition(1)
    val out = df.select(Similarity.cosineToQuery("embedding", q).as("c")).collect()
    assert(out.head.getDouble(0).isNaN) // Inf/Inf in both eval modes
    // and the interpreted path agrees
    val interp = graft.functions.CosineToQuery(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      q.map(_.toDouble).toSeq)
    assert(interp.eval(null).asInstanceOf[Double].isNaN)
  }

  test("the native expression runs inside WholeStageCodegen") {
    val q = Array.fill(8)(0.5f)
    val df = Seq((1, Seq.fill(8)(1.0f))).toDF("id", "embedding")
      .repartition(1) // LocalTableScan alone evaluates eagerly without codegen
      .select(Similarity.cosineToQuery("embedding", q).as("c"))
    // materialize THIS dataframe's own queryExecution first: under AQE the
    // final (codegen-annotated) plan only exists after execution, and
    // .as[Double] would build a separate one
    val out = df.collect()
    assert(math.abs(out.head.getDouble(0) - 1.0) < 1e-12)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the whole-stage-codegen stage marker in plan strings
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }
}
