package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class StreamingSketchSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("stream sketch ≡ batch sketch, bitwise, under arbitrary batch " +
      "slicing and replayed (duplicate) rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val b1 = (0 until 700).map(i => ("hostA", s"u$i")) ++
      (0 until 300).map(i => ("hostB", s"v$i"))
    val b2 = (500 until 1400).map(i => ("hostA", s"u$i"))  // overlaps b1
    val b3 = (0 until 700).map(i => ("hostA", s"u$i")) ++  // pure replay
      (300 until 450).map(i => ("hostB", s"v$i"))

    val in = MemoryStream[(String, String)]
    val q = StreamingSketch.start(
      in.toDF().toDF("host", "url"), "host", "url", "sketch_stream")
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      in.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    // latest update per group (memory sink keeps every Update row in
    // arrival order; the stream is single-threaded per group here)
    val updates = spark.table("sketch_stream")
      .as[StreamingSketch.SketchUpdate].collect()
    val last = updates.zipWithIndex.groupBy(_._1.group)
      .map { case (g, us) => g -> us.maxBy(_._2)._1 }

    val all = (b1 ++ b2 ++ b3).toDF("host", "url")
    Seq("hostA", "hostB").foreach { g =>
      val batch = graft.ops.Sketch.hllDistinct(
          all.filter($"host" === g), "url")
        .as[(Int, Int, Long, Double)].collect().head
      val s = last(g)
      assert((s.m, s.n_zero_registers, s.sum_fp) ==
        ((batch._1, batch._2, batch._3)), g)
      assert(java.lang.Double.doubleToRawLongBits(s.estimate) ==
        java.lang.Double.doubleToRawLongBits(batch._4), g)
    }
    // replay batch b3 added no new distincts for hostA beyond b1∪b2 —
    // idempotence: hostA's last two updates are identical
    val aUpdates = updates.filter(_.group == "hostA")
    assert(aUpdates.length == 3)
    assert(aUpdates(1).sum_fp == aUpdates(2).sum_fp)
  }
}
