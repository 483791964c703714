package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.SparkTestBase

class TrainingDataSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val good = "the quick brown fox jumps over the lazy dog and keeps " +
    "running through the quiet green fields toward the distant hills today"

  test("prepare: gate precedence and keeper selection") {
    val docs = Seq(
      (1L, good, "en"),                       // kept
      (2L, good, "en"),                       // duplicate of 1 (min id keeps 1)
      (3L, "too short text", "en"),           // too_short
      (4L, good + " different tail words now", "ja"), // lang
      (5L, "0123 456 789 0123 456 789 0123 456 789 0123 456 789", "en"), // low_alpha
      (6L, good + " another unique ending sentence", "de")) // kept
      .toDF("doc_id", "text", "lang")
    val out = TrainingData.prepare(docs)
      .select($"doc_id", $"kept", $"drop_reason")
      .as[(Long, Boolean, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((true, null)))
    assert(out(2L) == ((false, "duplicate")))
    assert(out(3L) == ((false, "too_short")))
    assert(out(4L) == ((false, "lang")))
    assert(out(5L) == ((false, "low_alpha")))
    assert(out(6L) == ((true, null)))
    val kept = TrainingData.keptIds(docs).as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("single narrow shuffle: one Exchange, keyed on the content hash") {
    val docs = Seq((1L, good, "en"), (2L, good, "en")).toDF("doc_id", "text", "lang")
    val plan = TrainingData.prepare(docs).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(1500)}")
    assert(plan.contains("hashpartitioning(__h"), plan.take(1500))
  }
}
