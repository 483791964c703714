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

  test("trainNbQuality: hand-derived doc counts and integer log-odds; " +
      "Bernoulli distinct; NULL labels train neither side") {
    val labeled = Seq(
      (1L, "good good clean prose", Some(true)),   // 'good' counted ONCE
      (2L, "clean prose here", Some(true)),
      (3L, "spam spam buy", Some(false)),
      (4L, "buy clean", Some(false)),
      (5L, "unlabeled clean", None))
      .toDF("doc_id", "text", "label")
    val m = QualityLm.trainNbQuality(labeled)
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def w(p: Long, n: Long): Int =
      java.lang.Long.toBinaryString(p + 1).length -
        java.lang.Long.toBinaryString(n + 1).length
    assert(m("good") == ((1L, 0L, w(1, 0))))   // repetition did not inflate
    assert(m("clean") == ((2L, 1L, w(2, 1)))) // doc 5 trained neither side
    assert(m("prose") == ((2L, 0L, w(2, 0))))
    assert(m("spam") == ((0L, 1L, w(0, 1))))
    assert(m("buy") == ((0L, 2L, w(0, 2))))
    assert(m("unlabeled") == ((0L, 0L, 0)))
    assert(w(1, 0) == 1 && w(0, 2) == -1)     // the bin-length floor-log2
  }

  test("scoreNbQuality: planted separable corpus classifies held-out docs; " +
      "unknown-token docs score 0") {
    val posV = Seq("alpha", "beta", "gamma", "delta")
    val negV = Seq("omega", "sigma", "kappa", "theta")
    val train = ((0 until 40).map(i =>
      (i.toLong, posV(i % 4) + " " + posV((i + 1) % 4), true)) ++
      (40 until 80).map(i =>
        (i.toLong, negV(i % 4) + " " + negV((i + 1) % 4), false)))
      .toDF("doc_id", "text", "label")
    val model = QualityLm.trainNbQuality(train)
    val holdout = Seq(
      (100L, "alpha gamma delta"), (101L, "omega kappa"),
      (102L, "beta theta beta"),   // mixed: 1 pos vs 1 neg token → tie = 0
      (103L, "neverseen tokens"))
      .toDF("doc_id", "text")
    val out = QualityLm.scoreNbQuality(holdout, model)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(100L)._3 == true && out(100L)._2 > 0)
    assert(out(101L)._3 == false && out(101L)._2 < 0)
    assert(out(102L)._2 == 0L && out(102L)._3 == false)
    assert(out(103L) == ((0L, 0L, false)))
  }
}
