package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract
object AlignedProbe { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "128")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val alignedPages = spark.read.parquet("/tmp/graft_bench_c32_n1280000/pages_aligned")
    .select("url", "warc_ts", "html", "text", "lang")
    .as[graft.pipeline.PageRow](org.apache.spark.sql.Encoders.product[graft.pipeline.PageRow])
  val out = "/tmp/graft_aligned_probe"
  val t0 = System.nanoTime()
  val s = Extract.run(spark, alignedPages, out, "probe", numBuckets = 64, repartitionForWrite = false)
  println(f"PROBE docs=${s.docs} secs=${(System.nanoTime()-t0)/1e9}%.1f")
  val files = new java.io.File(out + "/docs_clean").listFiles()
    .filter(_.isDirectory).map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
  println(s"PROBE_FILES docs_clean parquet files = $files")
  spark.stop()
}}
