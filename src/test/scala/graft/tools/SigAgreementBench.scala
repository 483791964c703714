package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native SigAgreement vs the HOF fold it replaced on the MinHash
  * est_jaccard candidate path: same pair scan, sum-aggregated to keep the
  * work on the executors. Prints per-variant medians of 5 timed runs. */
object SigAgreementBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.pipeline.SparkTestBase.spark
    import spark.implicits._
    val numPerm = 32
    val n = 500000
    var st = 42L
    def nextSig(): Long = {
      st = st * 6364136223846793005L + 1442695040888963407L
      (st >>> 16) % 1000L
    }
    val df = spark.range(n)
      .map(_ => (Array.fill(numPerm)(nextSig()), Array.fill(numPerm)(nextSig())))
      .toDF("mh_a", "mh_b").persist()
    df.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        df.select(sum(c)).collect()
        (System.nanoTime() - t0) / 1e6
      }.drop(2).sorted
      runs(runs.length / 2)
    }
    val hof = time(expr(
      "aggregate(zip_with(mh_a, mh_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
    val native = time(ColumnBridge.column(graft.functions.SigAgreement(
      ColumnBridge.expression($"mh_a"), ColumnBridge.expression($"mh_b"))))
    println(f"SIGBENCH n=$n perm=$numPerm native=${native}%.1f ms hof=${hof}%.1f ms speedup=${hof / native}%.2fx")
    spark.stop()
  }
}
