package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Native CosineToQuery vs the HOF composition it replaced: same scan,
  * same query vector, sum-aggregated to keep the work on the executors.
  * Prints per-variant medians of 5 timed runs after warmup. */
object CosineBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.pipeline.SparkTestBase.spark
    import spark.implicits._
    val dim = 64
    val n = 200000
    var st = 42L
    def nextF(): Float = {
      st = st * 6364136223846793005L + 1442695040888963407L
      ((st >>> 16) % 1000L) / 250.0f - 2.0f
    }
    val q = Array.fill(dim)(nextF())
    val df = spark.range(n).map { _ => Array.fill(dim)(nextF()) }
      .toDF("embedding").persist()
    df.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e6
      }.drop(2).sorted
      runs(runs.length / 2)
    }
    val hof = time(Similarity.cosineToQueryHof("embedding", q))
    val native = time(Similarity.cosineToQuery("embedding", q))
    println(f"COSBENCH n=$n dim=$dim native=${native}%.1f ms hof=${hof}%.1f ms speedup=${hof / native}%.2fx")
    spark.stop()
  }
}
