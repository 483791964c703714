package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for connectedComponents round cost (q_dedup_components). */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("cc-profile")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def secs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val pairs = graft.SparkEntry.dupPairsCorpus(spark, dir)
    val (n0, tIn) = secs(pairs.count())
    println(f"INPUT pairs=$n0 in $tIn%.2f s")
    val (cached, tCk) = secs {
      val c = pairs.localCheckpoint(); c.count(); c
    }
    println(f"CHECKPOINT in $tCk%.2f s")
    val (cc, tCc) = secs(graft.ops.Dedup.connectedComponents(cached).count())
    println(f"CC rows=$cc in $tCc%.2f s (excl input)")
    val (cc2, tCc2) = secs(graft.ops.Dedup.connectedComponents(cached).count())
    println(f"CC warm rows=$cc2 in $tCc2%.2f s")
    spark.stop()
  }
}
