package graft.tools
import org.apache.spark.sql.SparkSession
object FsCheck { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.hadoop.fs.file.impl", "graft.hadoop.NoChmodLocalFileSystem")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import spark.implicits._
  println("READY " + ProcessHandle.current().pid())
  Thread.sleep(8000)
  val df = spark.range(2000000).selectExpr("id", "repeat('xyz', 200) AS payload")
  df.repartition(16).write.mode("overwrite").parquet("/tmp/fscheck_out")
  println("WROTE")
  spark.stop()
}}
