package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import graft.ops.Dedup

class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private def variant(tag: String) = base + " " + tag

  test("streaming LSH candidates: cross-batch incremental pairs equal the " +
    "batch operators, old-old never re-emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch 1: docs 1/2 are near-dups, 3 is unrelated; batch 2: doc 4 is a
    // near-dup of the 1/2 family
    val b1 = Seq((1L, variant("alpha")), (2L, variant("beta")),
      (3L, (100 to 140).map(i => s"z$i neq").mkString(" ")))
    val b2 = Seq((4L, variant("gamma")))

    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairsStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        numPerm = 32, bands = 16)
      .writeStream.format("memory").queryName("lsh_pairs_stream")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def collected(): Set[(Long, Long, Double)] =
      spark.table("lsh_pairs_stream")
        .as[StreamingDedup.CandidatePair].collect()
        .map(p => (p.id_a, p.id_b, p.est_jaccard)).toSet
    try {
      in.addData(b1: _*)
      q.processAllAvailable()
      val after1 = collected()
      in.addData(b2: _*)
      q.processAllAvailable()
      val incremental = collected() -- after1

      // batch reference for micro-batch 1: the plain batch LSH operator
      val batch1 = Dedup.lshCandidatePairs(b1.toDF("doc_id", "text"),
          "doc_id", "text", numPerm = 32, bands = 16)
        .as[(Long, Long, Double)].collect().toSet
      assert(after1 == batch1, s"stream=$after1 batch=$batch1")
      assert(after1.exists(p => p._1 == 1L && p._2 == 2L)) // the planted pair

      // batch reference for micro-batch 2: the incremental operator over
      // the SAME split (batch-1 corpus as the persisted index)
      val fps1 = Dedup.fingerprints(b1.toDF("doc_id", "text"),
        "doc_id", "text", numPerm = 32, shingleN = 3)
      val inc = Dedup.incrementalLshPairs(b2.toDF("doc_id", "text"),
          "doc_id", "text",
          indexBands = Dedup.minhashBands(fps1, bands = 16),
          indexSigs = fps1.select($"id", $"minhash"),
          numPerm = 32, bands = 16)
        .as[(Long, Long, Double)].collect().toSet
      assert(incremental == inc, s"stream=$incremental batch=$inc")
      // every batch-2 emission involves the new doc — (1,2) is history
      assert(incremental.nonEmpty &&
        incremental.forall(p => p._1 == 4L || p._2 == 4L), incremental)
    } finally q.stop()
  }

  test("streaming LSH candidates: re-sent ids are already-indexed, not re-paired") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairsStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        numPerm = 32, bands = 16)
      .writeStream.format("memory").queryName("lsh_pairs_resend")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      in.addData((1L, variant("alpha")), (2L, variant("beta")))
      q.processAllAvailable()
      val n1 = spark.table("lsh_pairs_resend").count()
      assert(n1 > 0)
      in.addData((1L, variant("alpha"))) // exact re-send of doc 1
      q.processAllAvailable()
      // nothing new: the re-sent id is dropped at the state boundary
      assert(spark.table("lsh_pairs_resend").count() == n1)
    } finally q.stop()
  }
}
