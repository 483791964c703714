package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Compact physical-plan red-flag audit over SparkEntry queries.
  * For each query: counts of Exchange / BroadcastExchange / SortMergeJoin /
  * BroadcastHashJoin, plus scale red flags (CartesianProduct, global
  * single-partition Sort or Window). Args: optional comma-separated query
  * names (default: all). SPARK_GRAFT_SF_DIR selects the input (default
  * sf0.01 — plan SHAPE, not timing). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val wanted: Option[Set[String]] =
      if (args.isEmpty) None else Some(args(0).split(',').map(_.trim).toSet)
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.forall(_.contains(n)))
    for (name <- names) {
      val res = try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        def c(s: String) = s.r.findAllIn(p).length
        // formatted mode lists every node once in the tree and once in the
        // numbered details — halve the raw counts
        val exch = c("""\bExchange\b""") / 2
        val single = c("""SinglePartition""") / 2
        val smj = c("""SortMergeJoin""") / 2
        val bhj = (c("""BroadcastHashJoin""") + c("""BroadcastNestedLoopJoin""")) / 2
        val cart = c("""CartesianProduct""") / 2
        val flags = new StringBuilder
        if (cart > 0) flags.append(" CARTESIAN!")
        if (single > 0) flags.append(s" SINGLE_PARTITION_EXCHANGE=$single")
        f"exch=$exch%-3d smj=$smj%-2d bcast=$bhj%-2d$flags"
      } catch { case e: Throwable => s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(f"PLAN $name%-26s $res")
    }
    spark.stop()
  }
}
