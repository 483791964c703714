package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.ops.Similarity

/** Phase-timing diagnostic for q_ann_ivf_topk (run: Test/runMain
  * graft.tools.IvfProbe [sfDir]). Times centroid training, index
  * ensure, query-vector fetch, and the pruned probe separately, twice
  * each (cold vs warm within the session). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 128)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val cents = time("train")(SparkEntry.ivfCentroids(spark, dir))
      val idx = time("ensureIndex")(SparkEntry.ensureIvfIndex(spark, dir, cents))
      val q = time("queryVec")(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") === 0).select(col("embedding"))
          .head().getSeq[Float](0).toArray)
      time("probe")(
        Similarity.ivfTopK(spark, idx, "vec_id", "embedding", q, 10, cents,
          nProbes = 4).count())
    }
    spark.stop()
  }
}
