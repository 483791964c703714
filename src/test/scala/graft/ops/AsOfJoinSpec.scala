package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.SparkTestBase

class AsOfJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def snaps = Seq(
    // url-a: three snapshots, two of them at the SAME instant (tie)
    ("url-a", 100L, "sha-a1", "t1"),
    ("url-a", 200L, "sha-a2-lo", "t2"),
    ("url-a", 200L, "sha-a2-hi", "t3"), // greater tie at equal ts wins
    ("url-a", 300L, "sha-a3", "t4"),
    // url-b: a single snapshot
    ("url-b", 150L, "sha-b1", "t5"))
    .toDF("url", "snap_ts", "sha", "snap_id")

  private def run(probes: Seq[(String, String, Long)]) =
    AsOfJoin.asofJoin(
        probes.toDF("probe_id", "url", "probe_ts"), snaps,
        keyCol = "url", probeIdCol = "probe_id", probeTsCol = "probe_ts",
        snapTsCol = "snap_ts", tieCol = "snap_id", payloadCols = Seq("sha"))
      .select($"probe_id", $"snap_ts", $"sha")
      .as[(String, Option[Long], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

  test("asof: inclusive boundary, latest-wins, tie-break, null on no match") {
    val out = run(Seq(
      ("p-before", "url-a", 99L),   // precedes every snapshot → nulls
      ("p-first", "url-a", 100L),   // exactly AT a snapshot → inclusive
      ("p-between", "url-a", 199L), // between → the earlier one
      ("p-tie", "url-a", 200L),     // two snaps at 200 → max snap_id wins
      ("p-mid", "url-a", 250L),     // after the tie pair, before the last
      ("p-after", "url-a", 999L),   // after everything → latest
      ("p-b", "url-b", 150L),
      ("p-nokey", "url-zzz", 500L)) // key with NO history at all → nulls
    )
    assert(out("p-before") == ((None, None)))
    assert(out("p-first") == ((Some(100L), Some("sha-a1"))))
    assert(out("p-between") == ((Some(100L), Some("sha-a1"))))
    assert(out("p-tie") == ((Some(200L), Some("sha-a2-hi"))))
    assert(out("p-mid") == ((Some(200L), Some("sha-a2-hi"))))
    assert(out("p-after") == ((Some(300L), Some("sha-a3"))))
    assert(out("p-b") == ((Some(150L), Some("sha-b1"))))
    assert(out("p-nokey") == ((None, None)))
  }

  test("asof: every probe row survives exactly once, with its own columns") {
    val probes = Seq(("p1", "url-a", 250L), ("p2", "url-b", 10L))
    val df = AsOfJoin.asofJoin(
      probes.toDF("probe_id", "url", "probe_ts"), snaps,
      "url", "probe_id", "probe_ts", "snap_ts", "snap_id", Seq("sha"))
    assert(df.columns.toSeq ==
      Seq("probe_id", "url", "probe_ts", "snap_ts", "sha"))
    val rows = df.as[(String, String, Long, Option[Long], Option[String])]
      .collect().sortBy(_._1)
    assert(rows.length == 2)
    assert(rows(0) == (("p1", "url-a", 250L, Some(200L), Some("sha-a2-hi"))))
    assert(rows(1) == (("p2", "url-b", 10L, None, None)))
  }

  test("asof: a null payload field on the matched snapshot stays null " +
    "(no per-column fall-through to an older snapshot)") {
    val s2 = Seq(
      ("u", 100L, Option("old-sha"), "t1"),
      ("u", 200L, Option.empty[String], "t2")) // newest snapshot: null sha
      .toDF("url", "snap_ts", "sha", "snap_id")
    val out = AsOfJoin.asofJoin(
        Seq(("p", "u", 300L)).toDF("probe_id", "url", "probe_ts"), s2,
        "url", "probe_id", "probe_ts", "snap_ts", "snap_id", Seq("sha"))
      .select($"snap_ts", $"sha").as[(Option[Long], Option[String])]
      .collect()
    // the struct carries the WHOLE newest snapshot — null sha included —
    // rather than resurrecting old-sha from the t1 row
    assert(out.toSeq == Seq((Some(200L), None)))
  }
}
