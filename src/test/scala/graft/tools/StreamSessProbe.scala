package graft.tools

import graft.pipeline.SparkTestBase
import graft.streaming.StreamingSessions
import java.sql.Timestamp

/** Diagnostic: per-batch watermark + emissions for the streaming
  * sessionizer scenario in StreamingSessionsSpec. */
object StreamSessProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(sec: Long) = new Timestamp(sec * 1000L)

    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessions.sessionizeStream(
        in.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("probe_sessions")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def dump(tag: String): Unit = {
      val wm = Option(q.lastProgress).map(_.eventTime.get("watermark")).orNull
      val rows = spark.table("probe_sessions").collect().toList
      println(s"PROBE $tag watermark=$wm rows=$rows")
    }
    in.addData((1L, 10L, "view", ts(0)), (1L, 11L, "click", ts(100)),
      (2L, 20L, "view", ts(50)))
    q.processAllAvailable(); dump("b1")
    in.addData((1L, 12L, "view", ts(4000)))
    q.processAllAvailable(); dump("b2")
    in.addData((99L, 990L, "wm", ts(20000)))
    q.processAllAvailable(); dump("b3")
    in.addData((99L, 991L, "wm", ts(40000)))
    q.processAllAvailable(); dump("b4")
    q.stop()
    spark.stop()
  }
}
