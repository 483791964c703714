package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical check of Spark 4 ANSI division semantics (double vs int) and
  * the zero-vector cosine path. Run: Test/runMain graft.tools.AnsiDivProbe */
object AnsiDivProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    println("ansi=" + spark.conf.get("spark.sql.ansi.enabled"))
    def probe(label: String)(f: => Any): Unit =
      println(s"PROBE $label -> " + (try String.valueOf(f) catch { case e: Exception => "THROWS " + e.getClass.getSimpleName }))
    probe("double/0.0")(Seq((1.0, 0.0)).toDF("a", "b").select($"a" / $"b").head().get(0))
    probe("double/0int")(Seq((1.0, 0)).toDF("a", "b").select($"a" / $"b").head().get(0))
    probe("int/0int")(Seq((1, 0)).toDF("a", "b").select($"a" / $"b").head().get(0))
    // regression direction: the cosine path must yield NULL, never throw
    probe("zero-vec cosine (expect null)")(
      graft.ops.Dedup.verifyCosine(
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq((1L, Array(0f, 0f)), (2L, Array(1f, 1f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding").head().get(2))
    spark.stop()
  }
}
