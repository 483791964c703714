package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
object StageBench { def main(a: Array[String]): Unit = {
  val cpus = sys.env.getOrElse("SB_CPUS", "8")
  val spark = SparkSession.builder().master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  def secs[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  import spark.implicits._
  import org.apache.spark.sql.functions._
  val pages = spark.read.parquet(s"/tmp/graft_bench_c${cpus}_n1280000/pages").as[PageRow]
  // warmup
  Extract.extract(pages.limit(4000)).map(_.doc.parse_failed).count()
  secs("a dedup-only count")(Extract.latestPerUrl(pages).count())
  secs("b extract+count (after dedup)")(Extract.extract(Extract.latestPerUrl(pages)).count())
  val base = s"/tmp/sb_${System.nanoTime()}"
  secs("c wide write (repart bucket)")(
    Extract.extract(Extract.latestPerUrl(pages), 64)
      .select(col("doc.*"), $"meta", $"links", $"anchors")
      .repartition(64, col("url_bucket"))
      .write.mode("overwrite").partitionBy("url_bucket").parquet(s"$base/docs_clean"))
  val written = spark.read.parquet(s"$base/docs_clean")
  secs("d derive all three")({
    written.select($"meta.*", $"url_bucket").write.mode("overwrite").partitionBy("url_bucket").parquet(s"$base/doc_meta")
    written.select($"url".as("src_url"), explode($"links").as("l"), $"url_bucket").select($"src_url", $"l.*", $"url_bucket").write.mode("overwrite").partitionBy("url_bucket").parquet(s"$base/links")
    written.select($"url", explode($"anchors").as("anchor_id"), $"url_bucket").write.mode("overwrite").partitionBy("url_bucket").parquet(s"$base/anchors")
  })
  spark.stop()
}}
