package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

/** CCNet-shaped integer-rank LM scoring: exact rank arithmetic verified by
  * hand on a fixture small enough to enumerate. */
class QualityLmSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the the the cat"),
    (2L, "the dog"),
    (3L, "zzz qqq"),
    (4L, ""),
    (5L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  test("fitUnigram ranks by count desc then token asc, capped at vocabSize") {
    val vocab = QualityLm.fitUnigram(docs, vocabSize = 3)
      .as[(String, Long, Int)].collect().sortBy(_._3)
    // counts: the=4, then cat/dog/qqq/zzz all 1 — tie broken by token asc
    assert(vocab.toSeq == Seq(("the", 4L, 1), ("cat", 1L, 2), ("dog", 1L, 3)))
  }

  test("minCount prunes the hapax tail before ranking") {
    val vocab = QualityLm.fitUnigram(docs, vocabSize = 3, minCount = 2L)
      .as[(String, Long, Int)].collect()
    assert(vocab.toSeq == Seq(("the", 4L, 1)))
  }

  test("scoreDocs: exact rank sums, OOV accounting, bucket thresholds, empty/null docs") {
    val out = QualityLm.scoreSelfFit(docs, vocabSize = 3)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: the×3 (rank 1) + cat (rank 2) → sum 5, mean 1.25 < 3/2 → middle
    assert(out(1L) == ((1L, 4L, 0L, 5L, "middle")))
    // doc 2: the (rank 1) + dog (rank 3, in vocab) → sum 4, mean 2 ≥ 3/2 → tail
    assert(out(2L) == ((2L, 2L, 0L, 4L, "tail")))
    // doc 3: zzz + qqq both OOV (rank V+1=4) → sum 8, all OOV → tail
    assert(out(3L) == ((3L, 2L, 2L, 8L, "tail")))
    assert(out(4L) == ((4L, 0L, 0L, 0L, "tail")))
    assert(out(5L) == ((5L, 0L, 0L, 0L, "tail")))
  }

  test("head bucket is reachable and thresholds are exact cross-multiplications") {
    // headDiv=1: head iff mean rank < V — doc 1 (mean 1.25 < 3) qualifies
    val out = QualityLm.scoreSelfFit(docs, vocabSize = 3, headDiv = 1, midDiv = 1)
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r._5).toMap
    assert(out(1L) == "head")
    assert(out(2L) == "head") // mean 2 < 3
    assert(out(3L) == "tail") // mean 4 ≥ 3 — OOV-only doc never heads
  }

  test("scoring is deterministic across evaluations and broadcast-joins the vocab") {
    val df = QualityLm.scoreSelfFit(docs, vocabSize = 3)
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = df.collect().map(_.toString).sorted.toSeq
    assert(a == b)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
