package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Drive the streaming incremental near-dup surface end-to-end: a REAL
  * MemoryStream query over two micro-batches, printing every emitted
  * candidate pair. Expect PAIR lines for (1,2) after batch 1, pairs
  * involving 4 after batch 2, and STREAM_DEDUP_DONE. */
object StreamDedupDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.pipeline.SparkTestBase.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.candidatePairsStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        numPerm = 32, bands = 16)
      .writeStream.format("memory").queryName("drive_pairs")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def dump(tag: String): Unit =
      spark.table("drive_pairs").distinct()
        .as[graft.streaming.StreamingDedup.CandidatePair]
        .collect().sortBy(p => (p.id_a, p.id_b))
        .foreach(p => println(s"PAIR $tag ${p.id_a} ${p.id_b} ${p.est_jaccard}"))
    try {
      in.addData((1L, base + " alpha"), (2L, base + " beta"),
        (3L, (100 to 140).map(i => s"z$i neq").mkString(" ")))
      q.processAllAvailable(); dump("b1")
      in.addData((4L, base + " gamma"))
      q.processAllAvailable(); dump("b2")
      println("STREAM_DEDUP_DONE")
    } finally { q.stop(); spark.stop() }
  }
}
