package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline._
object PlanCheck { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import spark.implicits._
  val dir = "/root/testdata/sf0.01"
  def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    println(s"==== $name ====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(4000))
  }
  // pushdown check: filter + narrow projection on lineitem
  show("pushdown", spark.read.parquet(s"$dir/lineitem.parquet")
    .filter($"l_shipdate" > "1995-01-01" && $"l_quantity" > 30)
    .select($"l_orderkey", $"l_quantity"))
  // flagship changed-only join (projection narrowness)
  val pagesPath = "/tmp/plancheck_pages"
  if (!new java.io.File(pagesPath + "/_SUCCESS").exists())
    PagesGen.pages(spark, 500L).write.mode("overwrite").parquet(pagesPath)
  val pages = spark.read.parquet(pagesPath).as[PageRow]
  val prev = Seq(("u", "s", 1L)).toDF("url", "content_sha256", "size")
  show("changedOnly", Extract.changedOnly(pages, prev).toDF())
  show("latestPerUrl", Extract.latestPerUrl(pages).toDF())
  show("anchor_exists_broadcast", graft.SparkEntry.queries("q_anchor_exists")(spark, dir))
  show("agg_pricing", graft.SparkEntry.queries("q_agg_pricing")(spark, dir))
  spark.stop()
}}
