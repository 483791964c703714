package graft

import org.apache.spark.sql.SparkSession

/**
 * Auxiliary benchmark main (guide §1.4/§7.2) — NOT part of the driver
 * contract ([[Bench]] is frozen): per-query noop-sink isolation timings
 * (computes every column, no count()-pruning, no sink cost) and
 * `.explain("formatted")` plan dumps for the optimization evidence trail.
 *
 * env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as [[Bench]];
 *      SPARK_GRAFT_EXTRA_ONLY  = comma list of query names (default all);
 *      SPARK_GRAFT_EXTRA_MODE  = noop | explain | both (default both);
 *      SPARK_GRAFT_EXTRA_PLANDIR = dir for plan files (default plans/r06);
 *      SPARK_GRAFT_EXTRA_TAG   = plan file suffix (default "before":
 *                                plans/r06/<query>_before.txt);
 *      SPARK_GRAFT_EXTRA_RUNS  = timed noop runs per query (default 1).
 * Emits one JSON line {"queries_noop": {...}, ...} and writes it to
 * SPARK_GRAFT_EXTRA_JSON (default bench_extra_last.json).
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXTRA_MODE", "both")
    val planDir = sys.env.getOrElse("SPARK_GRAFT_EXTRA_PLANDIR", "plans/r06")
    val tag = sys.env.getOrElse("SPARK_GRAFT_EXTRA_TAG", "before")
    val nRuns = math.max(1, sys.env.getOrElse("SPARK_GRAFT_EXTRA_RUNS", "1").toInt)
    val only = sys.env.getOrElse("SPARK_GRAFT_EXTRA_ONLY", "")
    val qFilter: Option[Set[String]] =
      if (only.isEmpty) None
      else Some(only.split(',').map(_.trim).filter(_.nonEmpty).toSet)

    // session config mirrors the frozen Bench main so timings are comparable
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus.toInt * 4, 64))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    new java.io.File(planDir).mkdirs()
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => qFilter.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          spark.sparkContext.setJobDescription(s"extra:$name")
          if (mode == "explain" || mode == "both") {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$planDir/${name}_$tag.txt"), plan)
          }
          if (mode == "noop" || mode == "both") {
            val ts = (1 to nRuns).map { _ =>
              secs {
                fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              }
            }
            results(name) = ts.min
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench-extra] $name failed: $e")
            results(name) = -1.0
        } finally spark.sparkContext.setJobDescription(null)
      }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ > 0).sum
    val json = s"""{"metric":"noop_total","value":${f"$total%.3f"},"unit":"sec","queries_noop":$qs,"sf":"$sfDir","cpus":$cpus,"mode":"$mode","tag":"$tag"}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_EXTRA_JSON", "bench_extra_last.json")),
      json + "\n")
    catch { case e: Exception => System.err.println(s"[bench-extra] json write failed: $e") }
    spark.stop()
  }
}
