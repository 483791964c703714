package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase
import java.sql.Timestamp

class SessionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  private def run(rows: Seq[(Long, Long, String, Timestamp)],
                  gapSeconds: Long = 1800L) =
    Sessions.sessionize(rows.toDF("user_id", "event_id", "event_type", "ts"),
        "user_id", "ts", "event_id", "event_type", gapSeconds)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8)))
      .toMap

  test("gap strictly over the threshold splits; exactly at it does not") {
    // user 1: events at 0 s, 1800 s (== gap → same session), 3601 s
    // (1801 s > gap → new session)
    val out = run(Seq(
      (1L, 10L, "view", ts(0)),
      (1L, 11L, "click", ts(1800)),
      (1L, 12L, "view", ts(3601))))
    assert(out.keySet == Set((1L, 0L), (1L, 1L)))
    val (s0, s1) = (out((1L, 0L)), out((1L, 1L)))
    assert(s0 == ((0L, 1800L * 1000000L, 2L, 2L, 10L, 11L)))
    assert(s1 == ((3601L * 1000000L, 3601L * 1000000L, 1L, 1L, 12L, 12L)))
  }

  test("equal timestamps tie-break on event_id for first/last ids") {
    val out = run(Seq(
      (2L, 21L, "a", ts(100)),
      (2L, 20L, "b", ts(100)),
      (2L, 22L, "a", ts(100))))
    assert(out((2L, 0L)) ==
      ((100L * 1000000L, 100L * 1000000L, 3L, 2L, 20L, 22L)))
  }

  test("users never share sessions; numbering restarts per user") {
    val out = run(Seq(
      (3L, 30L, "x", ts(0)),
      (4L, 40L, "x", ts(0)),
      (4L, 41L, "y", ts(10000))))
    assert(out.keySet == Set((3L, 0L), (4L, 0L), (4L, 1L)))
    assert(out((3L, 0L))._3 == 1L)
    assert(out((4L, 1L))._5 == 41L)
  }

  test("input order never changes the result") {
    val rows = Seq(
      (5L, 52L, "c", ts(4000)),
      (5L, 50L, "a", ts(0)),
      (5L, 51L, "b", ts(100)))
    assert(run(rows) == run(rows.reverse))
  }

  test("one exchange: the rollup reuses the window's user partitioning") {
    val df = Sessions.sessionize(
      Seq((1L, 1L, "a", ts(0))).toDF("user_id", "event_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type")
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }
}
