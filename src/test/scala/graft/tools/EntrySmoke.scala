package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  println(s"ENTRY_ROWS=${graft.SparkEntry.entry(spark).count()}")
  spark.stop()
}}
