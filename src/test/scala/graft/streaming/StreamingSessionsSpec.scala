package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import java.sql.Timestamp

class StreamingSessionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // NOTE: event times start well above epoch 0 — the engine's initial
  // watermark IS epoch 0 and a stateful op drops rows at/behind the
  // watermark, so a t=0 event would vanish (verified empirically).
  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def batchReference(rows: Seq[(Long, Long, String, Timestamp)]) =
    graft.ops.Sessions.sessionize(
        rows.toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "ts", "event_id", "event_type", gapSeconds = 1800L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSet

  test("stream sessions equal the batch rollup: in-stream gap closes and " +
    "watermark timeouts both fire, exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // user 1: two sessions (gap proven IN-STREAM by the 14000 s event);
    // user 2: one session, closed only by the WATERMARK timeout
    val b1 = Seq((1L, 10L, "view", ts(10000)), (1L, 11L, "click", ts(10100)),
      (2L, 20L, "view", ts(10050)))
    val b2 = Seq((1L, 12L, "view", ts(14000)))
    // sentinels drive the watermark; their own session never closes and
    // is excluded from the comparison
    val s1 = Seq((99L, 990L, "wm", ts(30000)))
    val s2 = Seq((99L, 991L, "wm", ts(50000)))

    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessions.sessionizeStream(
        in.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800L, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def collected(): Set[(Long, Long, Long, Long, Long, Long, Long, Long)] =
      spark.table("sessions_stream")
        .as[StreamingSessions.SessionOut].collect()
        .map(s => (s.user_id, s.session_seq, s.start_us, s.end_us,
          s.n_events, s.n_types, s.first_event_id, s.last_event_id)).toSet
    try {
      in.addData(b1: _*); q.processAllAvailable()
      assert(collected().isEmpty) // nothing provably closed yet
      in.addData(b2: _*); q.processAllAvailable()
      // the 14000 s event proves user 1's first session closed, in-stream
      // (no watermark needed for THIS emission; user 2's timeout may or
      // may not have fired yet depending on the engine's timeout batch)
      val afterB2 = collected()
      val u1s0 = (1L, 0L, 10000L * 1000000L, 10100L * 1000000L,
        2L, 2L, 10L, 11L)
      assert(afterB2.contains(u1s0), afterB2)
      in.addData(s1: _*); q.processAllAvailable()
      in.addData(s2: _*); q.processAllAvailable()
      // sentinel user 99's own sessions are watermark plumbing — excluded
      val streamed = collected().filter(_._1 != 99L)
      val expected = batchReference(b1 ++ b2)
      assert(streamed == expected, s"stream=$streamed batch=$expected")
      // exactly-once: counts match the set sizes (no duplicate emissions)
      assert(spark.table("sessions_stream")
        .filter($"user_id" =!= 99L).count() == expected.size)
    } finally q.stop()
  }

  test("session numbering survives the timeout residue: a user's later " +
    "session continues the sequence") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val in = MemoryStream[(Long, Long, String, Timestamp)]
    val q = StreamingSessions.sessionizeStream(
        in.toDF().toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "ts", "event_id", "event_type",
        gapSeconds = 1800L, watermarkDelay = "1 minutes")
      .writeStream.format("memory").queryName("sessions_seq")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData((7L, 70L, "a", ts(10000))); q.processAllAvailable()
      // push the watermark far past session 0's close → timeout fires
      in.addData((99L, 990L, "wm", ts(20000))); q.processAllAvailable()
      in.addData((99L, 991L, "wm", ts(20001))); q.processAllAvailable()
      // user 7 returns much later: the residual counter numbers this 1
      in.addData((7L, 71L, "b", ts(30000))); q.processAllAvailable()
      in.addData((99L, 992L, "wm", ts(60000))); q.processAllAvailable()
      in.addData((99L, 993L, "wm", ts(60001))); q.processAllAvailable()
      val seqs = spark.table("sessions_seq")
        .as[StreamingSessions.SessionOut].collect()
        .filter(_.user_id == 7L).map(s => s.session_seq -> s.first_event_id)
        .toSet
      assert(seqs == Set(0L -> 70L, 1L -> 71L))
    } finally q.stop()
  }
}
